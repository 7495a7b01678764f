"""Four-step negacyclic NTT on the MXU via int8 digit matmuls.

PERF.md lever #3, built to be MEASURED (VERDICT r2 item 1): instead of
log2(N) radix-2 Harvey butterfly stages on the VPU (ops/ntt.py), the
transform is factored as two dense modular matmuls (sizes N1 and N2,
N = N1*N2) whose integer arithmetic runs on the MXU systolic array as
int8 digit products accumulated in int32, with one Shoup twist and one
digit recombine on the VPU between the passes.

Derivation (matching the reference transform bit for bit): the SEAL
forward negacyclic NTT (reference: ntt.cpp:213-282) computes

    out[j] = sum_k x[k] * psi^{(2*br(j)+1) * k}   (mod p)

with br = bit-reversal over log2(N) bits.  Writing j = j1*N2 + j2 and
k = k1*N2 + k2, br(j) splits as br(j) = br2(j2)*N1 + br1(j1), giving

    out[j1,j2] = sum_{k2} [ sum_{k1} x[k1,k2] psi1^{(2*br1(j1)+1)*k1} ]
                 * psi^{(2*br1(j1)+1)*k2} * w2^{br2(j2)*k2}

with psi1 = psi^{N2} (a 2*N1-th root: the size-N1 column pass IS a
SEAL-convention negacyclic NTT) and w2 = psi^{2*N1} (an N2-th root: the
row pass is a cyclic DFT with bit-reversed output).  The middle factor
is the per-element "twist".  The inverse factors symmetrically with
N^{-1} folded into the inverse column matrix.

Digit scheme: both the matrices and the data are split into balanced
base-256 digits (int8 in [-128,127]; the data split uses the
carry-free +0x80..80 lane-offset trick).  |digit*digit| <= 2^14 and the
K <= 512-term MXU contraction keeps every partial plane well inside
int32.  Digit-pair planes are regrouped by total shift s = d+e and
recombined on the VPU as a signed 128-bit ladder + one Barrett
reduction; a precomputed multiple-of-p offset makes the ladder result
provably non-negative.  The table builder checks the exact worst-case
headroom and rejects moduli too large for 128-bit recombination
(~55 bits at N<=65536) — callers fall back to ops/ntt.py.

Everything is shape-static and jit-friendly; tables are host-built
numpy constants closed over by the jitted caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from ..modulus import Modulus
from ..utils import numth
from . import modops
from .backend import xp

__all__ = ["MxuNttTables", "build_mxu_ntt_tables", "ntt_forward_mxu",
           "ntt_inverse_mxu"]

U64 = 0xFFFFFFFFFFFFFFFF
DIGIT_BITS = 8
BASE = 1 << DIGIT_BITS


def _shoupify(x: int, p: int) -> int:
    return ((x << 64) // p) & U64


def _offset_const(ndig: int) -> int:
    """sum_{i<ndig} 128 * 256^i — the balanced-digit lane offset."""
    return 128 * ((BASE ** ndig - 1) // (BASE - 1))


def _balanced_digits_host(mat_obj, ndig: int) -> np.ndarray:
    """Python-int matrix (object array) -> [ndig, ...] int8 balanced
    base-256 digits with sum_d digits[d] * 256^d == entry exactly."""
    out = np.zeros((ndig,) + mat_obj.shape, dtype=np.int8)
    flat = [int(v) for v in mat_obj.ravel()]
    for d in range(ndig):
        row = []
        nxt = []
        for v in flat:
            r = v % BASE
            if r >= BASE // 2:
                r -= BASE
            row.append(r)
            nxt.append((v - r) // BASE)
        out[d] = np.array(row, dtype=np.int8).reshape(mat_obj.shape)
        flat = nxt
    if any(v != 0 for v in flat):
        raise ValueError("matrix entries do not fit in the digit budget")
    return out


def _digits_for_balanced(vmax: int) -> int:
    """Smallest d with balanced base-256 digits covering [0, vmax]."""
    d = 1
    while _offset_const(d) < vmax:
        d += 1
    return d


def _digits_for_data(vmax: int) -> int:
    """Smallest d such that the +offset lane trick is carry-free:
    vmax + offset(d) < 256^d."""
    d = 1
    while vmax + _offset_const(d) >= BASE ** d:
        d += 1
    return d


@dataclass
class MxuNttTables:
    """Per-modulus-set four-step tables (stacked over the limb axis L)."""

    n: int
    n1: int
    n2: int
    moduli: List[int]
    ndig_w: int           # matrix digit count (balanced)
    ndig_x: int           # data digit count (balanced, offset trick)
    fwd_col: np.ndarray   # [L, DW, N1, N1] int8  (out j1 <- contraction k1)
    fwd_row: np.ndarray   # [L, DW, N2, N2] int8  (out j2 <- contraction k2)
    fwd_twist: np.ndarray        # [L, N1, N2] u64
    fwd_twist_shoup: np.ndarray
    inv_col: np.ndarray   # [L, DW, N1, N1] int8 (N^-1 folded; out k1 <- j1)
    inv_row: np.ndarray   # [L, DW, N2, N2] int8 (out k2 <- j2)
    inv_twist: np.ndarray        # [L, N1, N2] u64
    inv_twist_shoup: np.ndarray
    modulus: np.ndarray   # [L] u64
    ratio0: np.ndarray    # [L] u64 Barrett lo word of floor(2^128/p)
    ratio1: np.ndarray    # [L] u64 Barrett hi word
    neg_offset: np.ndarray  # [L, 2] u64 (lo, hi) multiple-of-p ladder offset


def _split_n(n: int) -> tuple:
    """N = N1 * N2 with the column (first-pass) contraction at the MXU
    tile size 128 when possible."""
    log_n = n.bit_length() - 1
    l1 = min(7, max(1, log_n - 1))
    l2 = log_n - l1
    return 1 << l1, 1 << l2


def build_mxu_ntt_tables(coeff_count_power: int, moduli: Sequence) -> MxuNttTables:
    n = 1 << coeff_count_power
    n1, n2 = _split_n(n)
    log_n1 = n1.bit_length() - 1
    log_n2 = n2.bit_length() - 1
    mods = [m.value if isinstance(m, Modulus) else int(m) for m in moduli]
    L = len(mods)
    pmax = max(mods)
    # data may be lazy in [0, 2p)
    ndig_w = _digits_for_balanced(pmax - 1)
    ndig_x = _digits_for_data(2 * pmax - 1)

    # Exact worst-case headroom check for the 128-bit recombine ladder:
    # |R_s| <= npairs(s) * K * 128 * 128 summed with shifts, plus the
    # positive offset, must stay below 2^128.
    s_planes = ndig_w + ndig_x - 1
    kmax = max(n1, n2)
    mag_bound = 0
    for s in range(s_planes):
        npairs = min(ndig_w, s + 1) - max(0, s - ndig_x + 1)
        mag_bound += (npairs * kmax * 128 * 128) << (DIGIT_BITS * s)
    off_target = 2 * mag_bound  # offset >= |negative sum|; total < offset+mag
    if (off_target + mag_bound) >> 128:
        raise ValueError(
            "moduli too large for the 128-bit MXU digit recombine "
            f"(need < ~2^55 at N={n}); use ops/ntt.py instead"
        )

    fwd_col = np.zeros((L, ndig_w, n1, n1), dtype=np.int8)
    fwd_row = np.zeros((L, ndig_w, n2, n2), dtype=np.int8)
    inv_col = np.zeros((L, ndig_w, n1, n1), dtype=np.int8)
    inv_row = np.zeros((L, ndig_w, n2, n2), dtype=np.int8)
    fwd_twist = np.zeros((L, n1, n2), dtype=np.uint64)
    fwd_twist_s = np.zeros((L, n1, n2), dtype=np.uint64)
    inv_twist = np.zeros((L, n1, n2), dtype=np.uint64)
    inv_twist_s = np.zeros((L, n1, n2), dtype=np.uint64)
    neg_off = np.zeros((L, 2), dtype=np.uint64)
    ratio0 = np.zeros(L, dtype=np.uint64)
    ratio1 = np.zeros(L, dtype=np.uint64)

    for li, p in enumerate(mods):
        psi = numth.try_minimal_primitive_root(2 * n, p)
        if psi is None:
            raise ValueError(f"modulus {p:#x} does not support NTT of size {n}")
        psi_inv = numth.try_invert_uint_mod(psi, p)
        n_inv = numth.try_invert_uint_mod(n, p)
        e1 = [2 * numth.reverse_bits(j1, log_n1) + 1 for j1 in range(n1)]

        # column pass: A[j1, k1] = psi1^{e1(j1) * k1}, psi1 = psi^{N2}
        psi1 = pow(psi, n2, p)
        a = np.zeros((n1, n1), dtype=object)
        for j1 in range(n1):
            w = pow(psi1, e1[j1], p)
            cur = 1
            for k1 in range(n1):
                a[j1, k1] = cur
                cur = (cur * w) % p
        fwd_col[li] = _balanced_digits_host(a, ndig_w)

        # row pass: B[j2, k2] = w2^{br2(j2) * k2}, w2 = psi^{2*N1}
        w2 = pow(psi, 2 * n1, p)
        b = np.zeros((n2, n2), dtype=object)
        for j2 in range(n2):
            w = pow(w2, numth.reverse_bits(j2, log_n2), p)
            cur = 1
            for k2 in range(n2):
                b[j2, k2] = cur
                cur = (cur * w) % p
        fwd_row[li] = _balanced_digits_host(b, ndig_w)

        # twist[j1, k2] = psi^{e1(j1) * k2}
        tw = np.zeros((n1, n2), dtype=object)
        for j1 in range(n1):
            w = pow(psi, e1[j1], p)
            cur = 1
            for k2 in range(n2):
                tw[j1, k2] = cur
                cur = (cur * w) % p
        fwd_twist[li] = tw.astype(np.uint64)
        fwd_twist_s[li] = np.array(
            [_shoupify(int(v), p) for v in tw.ravel()], dtype=np.uint64
        ).reshape(n1, n2)

        # ---- inverse ----
        # row pass first: V[j1,k2] = sum_j2 U[j1,j2] * w2^{-br2(j2)*k2}
        w2i = numth.try_invert_uint_mod(w2, p)
        bi = np.zeros((n2, n2), dtype=object)
        for k2 in range(n2):
            for j2 in range(n2):
                bi[k2, j2] = pow(w2i, numth.reverse_bits(j2, log_n2) * k2, p)
        inv_row[li] = _balanced_digits_host(bi, ndig_w)

        # untwist[j1, k2] = psi^{-e1(j1) * k2}
        twi = np.zeros((n1, n2), dtype=object)
        for j1 in range(n1):
            w = pow(psi_inv, e1[j1], p)
            cur = 1
            for k2 in range(n2):
                twi[j1, k2] = cur
                cur = (cur * w) % p
        inv_twist[li] = twi.astype(np.uint64)
        inv_twist_s[li] = np.array(
            [_shoupify(int(v), p) for v in twi.ravel()], dtype=np.uint64
        ).reshape(n1, n2)

        # column pass: x[k1,k2] = sum_j1 Ai[k1,j1] * W[j1,k2],
        # Ai[k1,j1] = psi1^{-e1(j1)*k1} * N^{-1}
        psi1_inv = numth.try_invert_uint_mod(psi1, p)
        ai = np.zeros((n1, n1), dtype=object)
        for k1 in range(n1):
            for j1 in range(n1):
                ai[k1, j1] = (pow(psi1_inv, (e1[j1] * k1) % (2 * n1), p) * n_inv) % p
        inv_col[li] = _balanced_digits_host(ai, ndig_w)

        # ladder offset: smallest multiple of p >= off_target
        off = ((off_target + p - 1) // p) * p
        neg_off[li, 0] = off & U64
        neg_off[li, 1] = (off >> 64) & U64
        quot = (1 << 128) // p
        ratio0[li] = quot & U64
        ratio1[li] = (quot >> 64) & U64

    return MxuNttTables(
        n=n, n1=n1, n2=n2, moduli=mods, ndig_w=ndig_w, ndig_x=ndig_x,
        fwd_col=fwd_col, fwd_row=fwd_row,
        fwd_twist=fwd_twist, fwd_twist_shoup=fwd_twist_s,
        inv_col=inv_col, inv_row=inv_row,
        inv_twist=inv_twist, inv_twist_shoup=inv_twist_s,
        modulus=np.array(mods, dtype=np.uint64),
        ratio0=ratio0, ratio1=ratio1, neg_offset=neg_off,
    )


def _balanced_digits_dev(x, ndig: int, m):
    """u64 data -> [ndig, ...] int8 balanced base-256 digits.

    Carry-free trick: lanes of (x + 0x80..80) minus 128 are the balanced
    digits of x, provided x + offset(ndig) < 256^ndig (checked by the
    table builder via the digit-count choice)."""
    xs = x + np.uint64(int("80" * 8, 16))
    digs = []
    for d in range(ndig):
        lane = ((xs >> np.uint64(8 * d)) & np.uint64(0xFF)).astype(m.int32)
        digs.append((lane - 128).astype(m.int8))
    return m.stack(digs, axis=0)


def _digit_matmul(x_dig, w_dig, contract_x: str):
    """Digit-pair MXU matmuls regrouped by total shift s = d + e.

    x_dig: int8[DX, ..., L, A, B]; w_dig: int8[L, DW, O, K] host table.
    contract_x selects which data axis is contracted against K:
    'A' -> out [..., L, O, B]; 'B' -> out [..., L, A, O].
    Returns int32[S, ...] partial planes.
    """
    host = isinstance(x_dig, np.ndarray)
    if host:
        def dot(w8, x8, sub):
            return np.einsum(sub, w8.astype(np.int32), x8.astype(np.int32))
    else:
        import jax.numpy as jnp

        def dot(w8, x8, sub):
            return jnp.einsum(sub, w8, x8, preferred_element_type=jnp.int32)

    dx = x_dig.shape[0]
    dw = w_dig.shape[1]
    sub = "lok,...lkb->...lob" if contract_x == "A" else "lok,...lak->...lao"
    planes = []
    for s in range(dx + dw - 1):
        acc = None
        for d in range(max(0, s - dx + 1), min(dw, s + 1)):
            e = s - d
            t = dot(w_dig[:, d], x_dig[e], sub)
            acc = t if acc is None else acc + t
        planes.append(acc)
    return planes


def _combine_planes(planes, tables: MxuNttTables, m):
    """[S] list of int32 planes -> u64 in [0, p).

    acc = offset + sum_s plane_s * 2^{8 s} as an exact 128-bit (hi, lo)
    pair (offset = multiple of p > any negative partial), then ONE
    Barrett reduction.  All shifts are static Python ints.
    """
    shape = planes[0].shape
    p = m.asarray(tables.modulus[:, None, None], dtype=m.uint64)
    r0 = m.asarray(tables.ratio0[:, None, None], dtype=m.uint64)
    r1 = m.asarray(tables.ratio1[:, None, None], dtype=m.uint64)
    lo = m.broadcast_to(
        m.asarray(tables.neg_offset[:, 0][:, None, None], dtype=m.uint64), shape
    )
    hi = m.broadcast_to(
        m.asarray(tables.neg_offset[:, 1][:, None, None], dtype=m.uint64), shape
    )
    for s, plane in enumerate(planes):
        v64 = plane.astype(m.int64)
        neg = v64 < 0
        mag = m.where(neg, -v64, v64).astype(m.uint64)
        shift = DIGIT_BITS * s
        if shift == 0:
            m_lo, m_hi = mag, m.zeros_like(mag)
        elif shift < 64:
            m_lo = mag << np.uint64(shift)
            m_hi = mag >> np.uint64(64 - shift)
        else:
            # |plane| < 2^31 and shift-64 <= 8(S-1)-64 stays < 64 by the
            # builder's headroom check
            m_lo = m.zeros_like(mag)
            m_hi = mag << np.uint64(shift - 64)
        add_lo = lo + m_lo
        add_hi = hi + m_hi + (add_lo < lo).astype(m.uint64)
        sub_lo = lo - m_lo
        sub_hi = hi - m_hi - (lo < m_lo).astype(m.uint64)
        lo = m.where(neg, sub_lo, add_lo)
        hi = m.where(neg, sub_hi, add_hi)
    return modops.barrett_reduce_128(hi, lo, p, r0, r1)


def _pass(x, w_dig, tables: MxuNttTables, contract_x: str, m):
    """One modular matmul pass: digit-split, MXU matmuls, recombine."""
    x_dig = _balanced_digits_dev(x, tables.ndig_x, m)
    planes = _digit_matmul(x_dig, w_dig, contract_x)
    return _combine_planes(planes, tables, m)


def ntt_forward_mxu(x, tables: MxuNttTables):
    """Forward negacyclic NTT, canonical [0, p) output.

    x: uint64[..., L, N] in [0, 2p).  Bit-exact equal to
    ops.ntt.ntt_forward (canonicalized) on the same input.
    """
    m = xp(x)
    batch = x.shape[:-1]
    xr = x.reshape(batch + (tables.n1, tables.n2))
    t = _pass(xr, tables.fwd_col, tables, "A", m)
    p3 = m.asarray(tables.modulus[:, None, None], dtype=m.uint64)
    s = modops.mul_mod_shoup(
        t, m.asarray(tables.fwd_twist, dtype=m.uint64),
        m.asarray(tables.fwd_twist_shoup, dtype=m.uint64), p3,
    )
    out = _pass(s, tables.fwd_row, tables, "B", m)
    return out.reshape(batch + (tables.n,))


def ntt_inverse_mxu(x, tables: MxuNttTables):
    """Inverse negacyclic NTT, canonical [0, p) output.

    x: uint64[..., L, N] in [0, 2p).  Bit-exact equal to
    ops.ntt.ntt_inverse (canonicalized) on the same input.
    """
    m = xp(x)
    batch = x.shape[:-1]
    xr = x.reshape(batch + (tables.n1, tables.n2))
    v = _pass(xr, tables.inv_row, tables, "B", m)
    p3 = m.asarray(tables.modulus[:, None, None], dtype=m.uint64)
    s = modops.mul_mod_shoup(
        v, m.asarray(tables.inv_twist, dtype=m.uint64),
        m.asarray(tables.inv_twist_shoup, dtype=m.uint64), p3,
    )
    out = _pass(s, tables.inv_col, tables, "A", m)
    return out.reshape(batch + (tables.n,))
