"""Vectorized host-side multiprecision arithmetic in base-2^64 limb planes.

The reference walks every coefficient through word-by-word C routines
(util/uintarith.cpp, rns.cpp:369-414 compose); here a length-N array of
K-word integers is a ``uint64[K, N]`` plane stack and every word-level
step (64x64->128 products, carries, borrows) is one vectorized numpy op
over the coefficient axis.  Used by the exact CKKS encode/decode paths
(reference: ckks.h:514-607, 668-744) and RNSBase.compose_array.

All functions are host-plane (numpy) by design: encode/decode are
host-API surfaces and must not trigger eager device dispatches
(CLAUDE.md two-planes invariant).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..ops import modops

_MASK64 = (1 << 64) - 1
_U64 = np.uint64


def int_to_limbs(x: int, nwords: int) -> np.ndarray:
    """Non-negative Python int -> uint64[nwords], least-significant first."""
    if x < 0:
        raise ValueError("int_to_limbs requires a non-negative value")
    out = np.zeros(nwords, dtype=_U64)
    for k in range(nwords):
        if not x:
            break
        out[k] = x & _MASK64
        x >>= 64
    if x:
        raise ValueError("value does not fit in nwords limbs")
    return out


def limbs_to_ints(limbs: np.ndarray) -> List[int]:
    """uint64[K, N] limb planes -> [N] Python ints (via one bytes pass)."""
    k, n = limbs.shape
    # column-major little-endian byte image: coefficient i occupies 8*K
    # consecutive bytes
    raw = np.ascontiguousarray(limbs.T.astype("<u8")).tobytes()
    step = 8 * k
    return [
        int.from_bytes(raw[i * step : (i + 1) * step], "little")
        for i in range(n)
    ]


def _add_word_inplace(acc: np.ndarray, k: int, word: np.ndarray) -> np.ndarray:
    """acc[k] += word (vector); returns the carry out as uint64[N]."""
    s = acc[k] + word
    carry = (s < word).astype(_U64)
    acc[k] = s
    return carry


def native_compose_consts(base, K: int):
    """Cached (K, inv_punc, mods, qhat, qprod) constants the native CRT
    kernels (gst_crt_compose / gst_crt_centered_double) consume; built
    once per RNSBase and word count."""
    consts = base.__dict__.get("_compose_native_consts")
    if consts is None or consts[0] != K:
        L = base.size
        qhat = np.stack(
            [int_to_limbs(base.punctured_prod[j], K) for j in range(L)]
        )
        qprod = int_to_limbs(base.base_prod, K + 1)
        consts = (
            K,
            np.asarray(base.inv_punctured_prod_mod_base, dtype=np.uint64),
            np.asarray(base.values(), dtype=np.uint64),
            qhat, qprod,
        )
        base._compose_native_consts = consts
    return consts


def compose_limbs(residues: np.ndarray, base, nwords: int | None = None) -> np.ndarray:
    """CRT-compose residue planes -> limb planes, fully vectorized.

    residues: uint64[L, N] with residues[j] in [0, q_j).
    base: RNSBase (supplies punctured products + inverses).
    Returns uint64[K, N] with each column the unique v in [0, q) such
    that v = residues[:, i] (mod each q_j).

    Reference semantics: rns.cpp:369-414 (RNSBase::compose) — here the
    per-coefficient loop is replaced by L vectorized rows of
    (t_j = x_j * inv_punc_j mod q_j) followed by a word-level
    multiply-accumulate of t_j * punctured_prod_j and at most L-1
    conditional big-subtractions of q.
    """
    L, n = residues.shape
    if L != base.size:
        raise ValueError("residue plane count does not match the base")
    q = base.base_prod
    K = nwords if nwords is not None else max(1, (q.bit_length() + 63) // 64)

    # native fast path (bit-identical exact integers; ~7x the numpy passes)
    from . import native as _native

    if _native.available():
        consts = native_compose_consts(base, K)
        out = _native.crt_compose(
            np.asarray(residues, dtype=np.uint64),
            consts[1], consts[2], consts[3], consts[4], K,
        )
        if out is not None:
            return out
    # one extra word for the pre-reduction sum (< L * q)
    acc = np.zeros((K + 1, n), dtype=_U64)

    for j in range(L):
        mod = base[j]
        p = _U64(mod.value)
        r0 = _U64(mod.const_ratio[0])
        r1 = _U64(mod.const_ratio[1])
        t = modops.mul_mod(
            residues[j].astype(_U64),
            _U64(base.inv_punctured_prod_mod_base[j]),
            p, r0, r1,
        )
        qhat = int_to_limbs(base.punctured_prod[j], K)
        carry = np.zeros(n, dtype=_U64)
        for k in range(K):
            hi, lo = modops.mul64_wide(t, qhat[k])
            c1 = _add_word_inplace(acc, k, lo)
            c2 = _add_word_inplace(acc, k, carry)
            # t < q_j < 2^62 so hi < 2^62: hi + c1 + c2 cannot wrap
            carry = hi + c1 + c2
        acc[K] += carry

    q_limbs = int_to_limbs(q, K + 1)[:, None]  # [K+1, 1] broadcast
    for _ in range(max(0, L - 1)):
        mask = geq_limbs(acc, q_limbs)
        if not mask.any():
            break
        sub_limbs_masked(acc, q_limbs, mask)
    return acc[:K]


def geq_limbs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized multi-limb a >= b (most-significant word first)."""
    k = a.shape[0]
    decided = np.zeros(a.shape[1:], dtype=bool)
    result = np.ones(a.shape[1:], dtype=bool)  # equal -> True (>=)
    for idx in range(k - 1, -1, -1):
        aw, bw = a[idx], np.broadcast_to(b[idx], a[idx].shape)
        gt = aw > bw
        lt = aw < bw
        result = np.where(~decided & gt, True, result)
        result = np.where(~decided & lt, False, result)
        decided |= gt | lt
    return result


def sub_limbs_masked(a: np.ndarray, b: np.ndarray, mask: np.ndarray) -> None:
    """In place a -= b where mask (requires a >= b there); vector borrows."""
    k = a.shape[0]
    borrow = np.zeros(a.shape[1:], dtype=_U64)
    m64 = mask.astype(_U64)
    for idx in range(k):
        bw = np.broadcast_to(b[idx], a[idx].shape) * m64  # 0 where unmasked
        d1 = a[idx] - bw
        brw1 = (a[idx] < bw).astype(_U64)
        d2 = d1 - borrow
        brw2 = (d1 < borrow).astype(_U64)
        a[idx] = d2
        borrow = brw1 + brw2
    # mask guarantees a >= b, so the final borrow is zero where masked


def sub_from_limbs(minuend_limbs: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Vectorized (M - a) for a constant M given as limbs [K,1]; a uint64[K,N].

    Requires M >= a columnwise (caller contract)."""
    out = np.broadcast_to(minuend_limbs, a.shape).copy()
    mask = np.ones(a.shape[1:], dtype=bool)
    sub_limbs_masked(out, a, mask)
    return out


def ladder_to_double(limbs: np.ndarray, unit: float) -> np.ndarray:
    """sum_k float(limbs[k]) * (unit * 2^(64 k)) in LSB-first order.

    Bit-exact vectorization of the reference decode ladder
    (ckks.h:700-741): same conversion rounding, same accumulation order;
    all-zero high words contribute exact +0.0 terms.
    """
    k, n = limbs.shape
    acc = np.zeros(n, dtype=np.float64)
    scaled = float(unit)
    for idx in range(k):
        acc = acc + limbs[idx].astype(np.float64) * scaled
        scaled *= 18446744073709551616.0  # 2^64
    return acc
