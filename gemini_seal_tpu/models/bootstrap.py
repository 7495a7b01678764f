"""CKKS bootstrapping — refresh an exhausted ciphertext to a usable level
WITHOUT decrypting.

No reference analogue: Gemini-SEAL/SEAL 3.5 stop at leveled CKKS (once the
modulus chain is consumed the ciphertext is dead); this module implements
the full HEAAN-style bootstrap (Cheon-Han-Kim-Kim-Song, "Bootstrapping for
Approximate Homomorphic Encryption") as ONE composition of this
framework's existing jitted pipelines:

    ct @ last level (mod q0 only)
      |  mod_raise            residues re-lifted to the full RNS chain;
      |                       underlying value becomes m + q0*I, |I| <~ K
      |  CoeffToSlot          BSGS (or FFT-factored) matvecs put scaled
      |                       coefficient halves into slots
      |  EvalMod              modular reduction on slots.  Two flavors:
      |                       "cosine" (default, models/evalmod.py):
      |                       Chebyshev fit of cos((2 pi t - pi/2)/2^r)
      |                       + r ~ 2-4 double-angle squarings
      |                       -> sin(2 pi t) ~ 2 pi frac(t);
      |                       "exp" (round-3 legacy): deg-7 Taylor of
      |                       exp(iu) + r ~ 8-12 squarings -> exp(2 pi i t)
      |  SlotToCoeff          BSGS matvecs fold the q0/(2 pi) constant
      |                       (and, exp mode only, the imaginary-part
      |                       extraction) into the slot->coefficient map
      v
    fresh ct near the TOP of the chain, same message, same scale

Two linear-map strategies (build_ckks_bootstrap(linear_mode=...)):
"dense" rides build_ckks_matvec_bsgs (~2*sqrt(slots) key switches per
map, O(s) plaintext diagonals, 2 levels per transform); "split" applies
the log-depth FFT factorization — the s-point slot transform's radix-2
butterfly stages (special_fft_stage_diagonals) collapsed into
ceil(log2(s)/radix) sparse groups of <= 2^(radix+1)-1 diagonals, one
level each, sharing ONE chain across both coefficient halves via the
packing identity z = E1 (a + i b) (E = [E1 | i*E1] for power-of-2
rings) with the bit-reversal permutation cancelling against SlotToCoeff
because EvalMod is slot-wise.  Split mode is what makes large-slot
bootstraps fit: O(2^radix) diagonals of plaintext per level instead of
O(s).  Every matrix is derived NUMERICALLY from the encoder's own
embedding (no closed-form DFT code to get subtly wrong):
E = embedding_forward(I_n) column-gathered through the generator-5
index map; the butterfly factorization is pinned by tests against the
dense product.

Precision: the floor is the LINEAR stages' key-switch/mod-down rounding
noise (~||s||_1 ~ N coefficient units) amplified by (K+1) * q0 / Dl_em,
where Dl_em is the scale the EvalMod plane runs at (round-5 diagnosis,
tools/bootstrap_diag.py: the Chebyshev engine itself contributes < 4e-8
at every probed shape; f_bits dilution and Paterson-Stockmeyer quotient
growth both measured flat).  Running EvalMod at the 45-bit message
scale under q0 = 2^59 costs a 2^14 amplification — the measured 4e-2
wall at N=4096 — so the split-cosine path derives Dl_em from ITS OWN
chain level's prime width and the production layout
(plan_bootstrap_chain) gives every bootstrap-consumed level a 59-bit
prime: measured max refresh error 3.6e-8 (N=128, K=12), 1.2e-6
(N=1024, K=34), see the PERF.md bootstrap rows.  The exp flavor
(legacy, 45-bit) needs r ~ 8-12 squarings and measured 1.4e-2 at
40-bit primes / ~2e-4 at 45-bit.  The sin cubic term (relative
~(2 pi |m| scale/q0)^2/6) sits far below either floor.  The secret is
SEAL's DENSE ternary key, so the mod-raise overflow bound K is
~4.5*sqrt(N/18) (~4.4 sigma of the lift residual, measured exactly by
tools/modraise_bound.py: max|I| = 52-61 over trials at N=4096 vs
K=68), larger than sparse-key HEAAN's.

Level cost (D_E = EvalMod depth: Chebyshev Paterson-Stockmeyer
ceil(log2(deg+1)) + 1 + r for cosine, 4 + r for exp):
dense 2 (C2S) + D_E + 2 (S2C); split 2*ceil(log2(s)/radix) + D_E.
"""

from __future__ import annotations

import math

import numpy as np

from ..context import SealContext
from ..ops.backend import xp
from ..ops.dyadic import add_poly, dyadic_product, sub_poly
from ..ops.keyswitch import KeySwitchPlan, switch_key
from ..ops.ntt import ntt_forward, ntt_inverse
from ..ops.rnsops import divide_and_round_q_last_ntt
from .pipelines import build_ckks_matvec_bsgs, build_ckks_mul_relin_rescale

__all__ = [
    "derive_slot_matrices",
    "special_fft_stage_diagonals",
    "compose_diagonals",
    "mod_raise",
    "build_ckks_bootstrap",
]


def plan_bootstrap_chain(n: int, radix: int = 3, K: int = None,
                         r: int = None, scale_bits: int = 45,
                         em_bits: int = 59, restored: int = 1,
                         nsp: int = 3):
    """Modulus-chain layout for a split-cosine refresh: the SINGLE source
    of truth the bench/tests/tools share (round 5).

    The bootstrap-consumed levels get `em_bits`-wide primes (59 default):
    the refresh error floor is the linear stages' rounding noise
    amplified by (K+1) * q0 / Dl_em, so running the EvalMod plane at the
    native prime width collapses the q0/Dl amplification that walled the
    45-bit layout at ~4e-2 (N=4096).  The `restored` post-refresh levels
    keep the user's `scale_bits` primes.

    Returns (bits, n_levels, K): pass bits to CoeffModulus.create and
    encrypt at scale 2**scale_bits.
    """
    from .evalmod import plan_evalmod

    if K is None:
        K = max(12, int(math.ceil(4.5 * math.sqrt(n / 18.0))))
    _, _, em_depth = plan_evalmod(K, r)
    gn = (int(math.log2(n // 2)) + radix - 1) // radix
    n_levels = 2 * gn + em_depth + 1
    bits = ([59] + [scale_bits] * restored + [em_bits] * n_levels
            + [59] * nsp)
    return bits, n_levels, K


def derive_slot_matrices(encoder):
    """(E, Minv): E[j,k] = value of slot j for unit coefficient k (the
    canonical-embedding decode map restricted to the generator-5 slot
    order); Minv is the inverse of [E; conj(E)], i.e. coefficient
    recovery from (slots, conj slots).  Derived by pushing the identity
    through the encoder's own vectorized embedding."""
    n = encoder._n
    s = encoder.slots
    F = encoder._embedding_forward(np.eye(n, dtype=np.complex128))
    E = F[:, encoder._index_map[:s]].T                       # [s, n]
    Minv = np.linalg.inv(np.vstack([E, np.conj(E)]))         # [n, n]
    return E, Minv


def _matrix_diagonals(M):
    """Square complex matrix -> Halevi-Shoup generalized diagonals
    {d: [M[i, (i+d) % s] for i]} (the convention build_ckks_matvec* use:
    y = sum_d diag_d * rot(x, d))."""
    s = M.shape[0]
    idx = (np.arange(s)[:, None] + np.arange(s)[None, :]) % s
    cols = M[np.arange(s)[:, None], idx]                     # [s(i), s(d)]
    return {d: cols[:, d] for d in range(s)}


def special_fft_stage_diagonals(encoder):
    """Butterfly factorization of the s-point slot transform, in diagonal
    form.  E = [E1 | i*E1] for power-of-2 rings (zeta_j^s = i in the
    generator-5 slot order), so decode is z = E1 (a + i b) over the two
    coefficient halves, and E1 = B_m ... B_1 P with P the bit-reversal
    permutation and each B_t a radix-2 butterfly with THREE generalized
    diagonals at offsets {0, +2^(t-1), s - 2^(t-1)}.  P is OMITTED here:
    EvalMod is slot-wise, so the permutation cancels between CoeffToSlot
    (which applies the B_t^{-1} chain) and SlotToCoeff (the B_t chain).

    Returns (fwd, inv): per-stage diagonal dicts {offset: complex[s]} of
    B_t and B_t^{-1} (the 2x2 block [[1, w], [1, -w]] inverts to
    [[1/2, 1/2], [1/(2w), -1/(2w)]] — same sparsity), t = 1..log2(s).
    """
    s = encoder.slots
    M = 4 * s                                 # root-group order (= 2n)
    psi = np.exp(2j * np.pi / M)
    rot = [pow(5, j, M) for j in range(s)]
    fwd, inv = [], []
    ln = 2
    while ln <= s:
        lenh, lenq = ln // 2, ln * 4
        d0f = np.zeros(s, complex)
        dpf = np.zeros(s, complex)
        dmf = np.zeros(s, complex)
        d0i = np.zeros(s, complex)
        dpi = np.zeros(s, complex)
        dmi = np.zeros(s, complex)
        for i in range(0, s, ln):
            for j in range(lenh):
                w = psi ** ((rot[j] % lenq) * (M // lenq))
                u, l = i + j, i + j + lenh
                d0f[u] = 1.0
                dpf[u] = w                    # B[u, u + lenh]
                d0f[l] = -w
                dmf[l] = 1.0                  # B[l, l - lenh]
                d0i[u] = 0.5
                dpi[u] = 0.5
                d0i[l] = -0.5 / w
                dmi[l] = 0.5 / w
        # at the last stage lenh == s/2, so +lenh and s-lenh are the SAME
        # cyclic offset — merge (the two vectors live on disjoint rows)
        def _merged(d0, dp, dm):
            out = {0: d0}
            for d, v in ((lenh, dp), ((s - lenh) % s, dm)):
                out[d] = v if d not in out else out[d] + v
            return out

        fwd.append(_merged(d0f, dpf, dmf))
        inv.append(_merged(d0i, dpi, dmi))
        ln *= 2
    return fwd, inv


def compose_diagonals(A, B, s):
    """Diagonals of the matrix product A @ B from the diagonals of each:
    (A @ B)_{dA+dB}[i] += A_{dA}[i] * B_{dB}[(i + dA) % s].  Exact-zero
    diagonals are dropped, so collapsed butterfly groups stay sparse
    (a radix-2^k group has <= 2^(k+1) - 1 diagonals)."""
    out = {}
    for dA, va in A.items():
        for dB, vb in B.items():
            d = (dA + dB) % s
            term = va * np.roll(vb, -dA)
            out[d] = term if d not in out else out[d] + term
    return {d: v for d, v in out.items() if np.abs(v).max() > 1e-14}


def _collapse_chain(stages_in_application_order, s, radix):
    """Group consecutive stages (application order) into radix-sized
    collapsed matrices: group = last @ ... @ first of its chunk."""
    groups = []
    for i in range(0, len(stages_in_application_order), radix):
        chunk = stages_in_application_order[i:i + radix]
        G = chunk[0]
        for B in chunk[1:]:
            G = compose_diagonals(B, G, s)
        groups.append(G)
    return groups


def _scale_diagonals(D, c):
    return {d: c * v for d, v in D.items()}


class ModRaisePlan:
    """Host-precomputed constants for mod_raise: centered residue lift
    from the last level's lone prime q0 to the full top-level RNS basis."""

    def __init__(self, context: SealContext, last_parms_id, top_parms_id):
        last_cd = context.get_context_data(last_parms_id)
        top_cd = context.get_context_data(top_parms_id)
        if len(last_cd.parms.coeff_modulus) != 1:
            raise ValueError("mod_raise expects a last-level (L=1) input")
        self.q0 = last_cd.parms.coeff_modulus[0].value
        if top_cd.parms.coeff_modulus[0].value != self.q0:
            raise ValueError("chain must keep q0 as its base prime")
        self.last_tables = last_cd.ntt_tables
        self.top_tables = top_cd.ntt_tables
        ps = np.asarray(
            [m.value for m in top_cd.parms.coeff_modulus], dtype=np.uint64
        )
        self.p = ps[:, None]                                  # [L, 1]
        self.q0_mod_p = (np.uint64(self.q0) % ps)[:, None]
        self.half = np.uint64(self.q0 >> 1)


def mod_raise(ct_data, plan: ModRaisePlan):
    """u64[..., 2, 1, N] mod q0 (NTT form) -> u64[..., 2, L_top, N] (NTT
    form): inverse-NTT, centered lift of each residue to (-q0/2, q0/2],
    re-reduce against every top-level prime, forward-NTT.  The underlying
    plaintext becomes m + q0*I with ||I||_inf bounded by the secret's
    expansion factor."""
    p = xp(ct_data)
    c = ntt_inverse(ct_data, plan.last_tables)                # [..., 2, 1, N]
    neg = c > plan.half                                       # centered sign
    r = c % plan.p                                            # [..., 2, L, N]
    corr = (r + (plan.p - plan.q0_mod_p)) % plan.p
    out = p.where(neg, corr, r).astype(p.uint64)
    return ntt_forward(out, plan.top_tables)


def build_ckks_bootstrap(context: SealContext, scale: float, encoder,
                         msg_bound: float = 1.0, K: int = None,
                         r: int = None, baby: int = None,
                         composed: bool = True,
                         linear_mode: str = "dense", radix: int = 3,
                         evalmod: str = "cosine", f_bits: int = None):
    """fn(ct_data, rot_keys_stack, conj_key, relin_key) -> refreshed ct.

    ct_data: u64[..., 2, 1, N] at the LAST level of the chain (NTT form)
    with the given `scale`; the output encrypts the SAME slot values at
    (approximately) the SAME scale at `out_parms_id`, ready for further
    multiplications.

    linear_mode="dense" (default): CoeffToSlot/SlotToCoeff are 4+4 dense
    BSGS matvecs over the numerically-derived slot matrices — 2 levels
    per transform, ~2*sqrt(s) rotation keys, O(s) plaintext diagonals.

    linear_mode="split": the log-depth FFT factorization — the s-point
    slot transform's radix-2 butterfly stages (special_fft_stage_
    diagonals) are collapsed into ceil(log2(s)/radix) groups of
    <= 2^(radix+1)-1 generalized diagonals each; CoeffToSlot applies the
    inverse-stage chain to ONE ciphertext (the packing identity
    z = E1 (a + i b) needs no front conjugation), splits the halves with
    a single conjugation, and SlotToCoeff shares one chain across both
    halves (the bit-reversal permutation cancels against CoeffToSlot
    because EvalMod is slot-wise).  1 level per group, 3*ceil(m/radix)+1
    small matvecs total, O(2^radix) diagonals of plaintext per level —
    the memory/key footprint that makes large-slot bootstraps feasible.

    Returns (fn, out_parms_id, out_scale, rot_steps, conj_elt):
    rot_keys_stack stacked for `rot_steps`, conj_key stacked for the
    single conjugation element 2N-1.

    evalmod="cosine" (default): the modular-reduction stage is the
    Chebyshev-cosine EvalMod (models/evalmod.py) — a degree-d Chebyshev
    fit of cos((2 pi t - pi/2)/2^r) evaluated by Paterson-Stockmeyer,
    then r ~ 3-4 double-angle squarings.  The refresh error floor is
    the rescale noise amplified by 2^r * q0/(2 pi scale); dropping r
    from the exp trick's 10-12 to 3-4 buys ~2 orders of magnitude of
    output precision AND fewer burned levels.  evalmod="exp" keeps the
    round-3 path (deg-7 Taylor of exp + r double-angle squarings) for
    comparison.

    composed=True (default): fn is an already-compiled Python callable
    chaining per-stage jitted programs (seconds of compile each);
    composed=False returns one jittable function (a single deep XLA
    graph — only for fusion experiments).  Outputs are bit-identical.

    f_bits (split-cosine only): extraction-headroom bits — the
    conjugation key-switch noise is diluted 2^f_bits by the shared
    normalization level.  Default auto-scales with the ring size and
    the EvalMod window: 12 + log2-ish(N/128) + log2-ish((K+1)/13)
    (the round-5 N=4096 calibration; the norm constant's rounding is
    folded EXACTLY into the C2S constants, so larger f_bits costs
    nothing in quantization).

    Level cost (D_E = the EvalMod depth: ceil-split Chebyshev depth
    + 1 + r for "cosine", 4 + r for "exp"): dense 4 + D_E; split
    2*ceil(log2(s)/radix) + D_E.
    Requirements: the chain's base prime q0 must be >> scale (the output
    error floor tracks q0/(2 pi scale) — see the module docstring), the
    special-prime budget must cover top-level key switches, and slot
    magnitudes must stay within msg_bound.
    """
    import jax
    import jax.numpy as jnp

    from .pipelines import build_ckks_matvec

    n = encoder._n
    s = encoder.slots
    if K is None:
        K = max(12, int(math.ceil(4.5 * math.sqrt(n / 18.0))))
    if evalmod not in ("cosine", "exp"):
        raise ValueError(f"unknown evalmod {evalmod!r}")
    if evalmod == "cosine":
        from .evalmod import ChebyEvalMod, plan_evalmod

        r, cos_coeffs, em_depth = plan_evalmod(K, r)
    else:
        if r is None:
            r = int(math.ceil(math.log2(2 * math.pi * (K + 1.5) / 0.15)))
        em_depth = 4 + r
    if linear_mode not in ("dense", "split"):
        raise ValueError(f"unknown linear_mode {linear_mode!r}")
    if linear_mode == "split":
        m_st = int(math.log2(s))
        if 2 ** m_st != s or s < 2:
            raise ValueError("split mode needs a power-of-two slot count")
        Gn = (m_st + radix - 1) // radix
        base = Gn
        # cosine split spends ONE extra shared normalization level: the
        # halves-extraction conjugation happens on 2^F-amplified values
        # (its key-switch noise would otherwise land directly on the
        # EvalMod input y, amplified by q0 (K+1)/scale ~ 2^17+ at the
        # output — the measured 6.5e-4 split floor), then one
        # plain-mult+rescale returns to scale Dl before the engine.
        norm_extra = 1 if evalmod == "cosine" else 0
        n_levels = 2 * Gn + em_depth + norm_extra
    else:
        base = 2
        norm_extra = 0
        n_levels = 4 + em_depth

    # ---- chain walk: top -> levels used by each stage -------------------
    cds = [context.get_context_data(context.first_parms_id)]
    for _ in range(n_levels):
        nxt = cds[-1].next_context_data
        if nxt is None:
            raise ValueError(
                f"modulus chain too short: bootstrap needs {n_levels} "
                f"levels below the top (r={r} squarings, "
                f"linear_mode={linear_mode!r})")
        cds.append(nxt)
    last_cd = cds[-1]
    while last_cd.next_context_data is not None:
        last_cd = last_cd.next_context_data
    top_cd = cds[0]
    q = [cd.parms.coeff_modulus[-1].value for cd in cds]      # q[i] dropped i->i+1
    limbs = [cd.limb_constants for cd in cds]
    L = [len(cd.parms.coeff_modulus) for cd in cds]
    q0 = last_cd.parms.coeff_modulus[0].value

    raise_plan = ModRaisePlan(context, last_cd.parms_id, top_cd.parms_id)
    Dl = float(scale)
    gamma = 2j * math.pi * Dl / (float(q0) * float(2 ** r))
    # split-cosine extraction headroom: the conjugation key-switch noise
    # lands on 2^F-amplified values and is diluted 2^F-fold by the shared
    # normalization level, so F sets the refresh's conj-noise floor.  The
    # default grows with the ring (KS noise ~ sqrt(N)) and with the
    # EvalMod amplification (K+1) — the N=128 floor measurements pinned
    # F=12; each doubling of N and of (K+1) buys one more dilution bit.
    if f_bits is None:
        f_bits = (12 + max(0, (n // 2).bit_length() - 7)
                  + max(0, (K + 1).bit_length() - 4))
    F_bits = min(int(f_bits), 30)
    lvl_s2c = base + em_depth + norm_extra

    # ---- shared primitive helpers ---------------------------------------
    conj_elt = 2 * n - 1
    if evalmod == "cosine":
        # cosine mode needs conjugation only where the coefficient halves
        # are extracted: after C2S in split mode, on the raised ct in
        # dense mode — EvalMod's output is already (real) sin, so S2C
        # needs no imaginary-part extraction.
        conj_levels = (0,) if linear_mode == "dense" else (base,)
    else:
        conj_levels = ((0, lvl_s2c) if linear_mode == "dense"
                       else (base, lvl_s2c))
    conj_plans = {lvl: KeySwitchPlan(context, cds[lvl].parms_id)
                  for lvl in conj_levels}
    galois_tools = {lvl: cds[lvl].galois_tool for lvl in conj_levels}

    def conjugate(ct, lvl, conj_key):
        tool = galois_tools[lvl]
        c0 = tool.apply_galois_ntt(ct[..., 0, :, :], conj_elt)
        c1 = tool.apply_galois_ntt(ct[..., 1, :, :], conj_elt)
        d0, d1 = switch_key(c1, conj_key, conj_plans[lvl], True)
        return jnp.stack([add_poly(c0, d0, limbs[lvl]), d1], axis=-3)

    def rescale(ct, lvl):
        """One q-last division at level lvl -> level lvl + 1."""
        cd = cds[lvl]
        return divide_and_round_q_last_ntt(
            ct, cd.device_rns_tool, cd.ntt_tables)

    def plain_mul(ct, pt, lvl):
        return jnp.stack([
            dyadic_product(ct[..., 0, :, :], pt, limbs[lvl]),
            dyadic_product(ct[..., 1, :, :], pt, limbs[lvl]),
        ], axis=-3)

    def plain_add(ct, pt, lvl):
        c0 = add_poly(ct[..., 0, :, :], pt, limbs[lvl])
        return jnp.concatenate([c0[..., None, :, :], ct[..., 1:, :, :]],
                               axis=-3)

    def ct_add(x, y, lvl):
        return add_poly(x, y, limbs[lvl])

    def ct_sub(x, y, lvl):
        return sub_poly(x, y, limbs[lvl])

    def _enc(val, sc, lvl):
        if isinstance(val, complex):
            pt = encoder.encode([val] * s, sc, cds[lvl].parms_id)
        else:
            pt = encoder.encode(val, sc, cds[lvl].parms_id)
        return np.asarray(pt.data)

    # Taylor coefficients of exp: a_k = 1/k!
    a = [1.0 / math.factorial(k) for k in range(8)]

    def make_evalmod(b, sigma_u, c=1.0):
        """Degree-7 Taylor of exp(c * x) + r double-angle squarings,
        starting at level b with input scale sigma_u.  The per-half
        constant c (split mode: 1 and -i for the two conjugation-
        extracted halves; |c| must stay O(1) — see the C2S folding note)
        folds into the Taylor coefficients as a_k * c^k — the squarings
        then amplify exp(c x / ...) exactly as in the plain flow.
        Returns (stage_fn, sigma_z)."""
        sq_b = build_ckks_mul_relin_rescale(context, cds[b].parms_id,
                                            square=True)
        sq_b1 = build_ckks_mul_relin_rescale(context, cds[b + 1].parms_id,
                                             square=True)
        mul3 = build_ckks_mul_relin_rescale(context, cds[b + 1].parms_id)
        mul_hi = build_ckks_mul_relin_rescale(context, cds[b + 2].parms_id)
        sigma_u2 = sigma_u * sigma_u / float(q[b])            # level b+1
        sigma_u3 = sigma_u2 * sigma_u / float(q[b + 1])       # level b+2
        sigma_u4 = sigma_u2 * sigma_u2 / float(q[b + 1])      # level b+2
        # sigma_hi = Dl^2 keeps every alignment constant's encode scale
        # near Dl (sigma_hi = Dl would push them to ~1, rounding a_k to
        # garbage); the resulting ~Dl^2-scaled w gets one closing rescale.
        sigma_hi = Dl * Dl
        sigma_w = sigma_u4 * sigma_hi / float(q[b + 2])       # level b+3
        ck = [c ** k for k in range(8)]
        # hi = a4 + a5 u + a6 u2 + a7 u3, aligned at level b+2, scale hi
        hi_u = _enc(a[5] * ck[5], sigma_hi / sigma_u, b + 2)
        hi_u2 = _enc(a[6] * ck[6], sigma_hi / sigma_u2, b + 2)
        hi_u3 = _enc(a[7] * ck[7], sigma_hi / sigma_u3, b + 2)
        hi_c = _enc(a[4] * ck[4], sigma_hi, b + 2)
        # low = a0 + a1 u + a2 u2 + a3 u3, aligned at level b+3
        lo_u = _enc(a[1] * ck[1], sigma_w / sigma_u, b + 3)
        lo_u2 = _enc(a[2] * ck[2], sigma_w / sigma_u2, b + 3)
        lo_u3 = _enc(a[3] * ck[3], sigma_w / sigma_u3, b + 3)
        lo_c = _enc(a[0] * ck[0], sigma_w, b + 3)
        sigma_w6 = sigma_w / float(q[b + 3])                  # level b+4
        sq_r = [build_ckks_mul_relin_rescale(context, cds[b + 4 + i].parms_id,
                                             square=True) for i in range(r)]
        sigma_z = sigma_w6
        for i in range(r):
            sigma_z = sigma_z * sigma_z / float(q[b + 4 + i])

        def stage(u, relin_key):
            u2 = sq_b(u, relin_key)                           # level b+1
            u3 = mul3(u2, u[..., :L[b + 1], :], relin_key)    # level b+2
            u4 = sq_b1(u2, relin_key)                         # level b+2
            hi = plain_mul(u[..., :L[b + 2], :], hi_u, b + 2)
            hi = add_poly(hi, plain_mul(u2[..., :L[b + 2], :], hi_u2, b + 2),
                          limbs[b + 2])
            hi = add_poly(hi, plain_mul(u3, hi_u3, b + 2), limbs[b + 2])
            hi = plain_add(hi, hi_c, b + 2)
            w = mul_hi(u4, hi, relin_key)                     # level b+3
            lo = plain_mul(u[..., :L[b + 3], :], lo_u, b + 3)
            lo = add_poly(lo, plain_mul(u2[..., :L[b + 3], :], lo_u2, b + 3),
                          limbs[b + 3])
            lo = add_poly(lo, plain_mul(u3[..., :L[b + 3], :], lo_u3, b + 3),
                          limbs[b + 3])
            lo = plain_add(lo, lo_c, b + 3)
            w = add_poly(w, lo, limbs[b + 3])
            w = rescale(w, b + 3)                             # level b+4
            for i in range(r):
                w = sq_r[i](w, relin_key)                     # level b+5+i
            return w

        return stage, sigma_z

    # =====================================================================
    if linear_mode == "split":
        fwd_st, inv_st = special_fft_stage_diagonals(encoder)
        inv_app = list(reversed(inv_st))          # B_m^{-1} applied first
        c2s_groups = _collapse_chain(inv_app, s, radix)
        s2c_groups = _collapse_chain(fwd_st, s, radix)
        assert len(c2s_groups) == len(s2c_groups) == Gn

        step_set = set()
        for g in c2s_groups + s2c_groups:
            step_set |= {d for d in g if d != 0}
        rot_steps = sorted(step_set)
        sidx = {d: i for i, d in enumerate(rot_steps)}

        def make_group(diag, lvl, delta):
            fn = build_ckks_matvec(context, diag, delta, encoder,
                                   parms_id=cds[lvl].parms_id)
            st = [d for d in sorted(diag) if d != 0]
            idx = np.asarray([sidx[d] for d in st], dtype=np.int64)
            return fn, idx

        # CoeffToSlot: Gn groups, scale-preserving (delta = dropped prime),
        # with the total front constant FOLDED INTO THE DIAGONALS — spread
        # as |c|^(1/Gn) per group (phase on the first) so each group's
        # plaintext values stay well above the encode quantum.  Folding
        # the constant into the EvalMod coefficients instead (down to
        # ~1e-47) quantizes them to garbage at any fixed encode scale
        # while the un-shrunk EvalMod input grows as (q0 K/Dl)^k —
        # encode rounding alone then contributes ~2^-46 * |x|^4 ~ 1e9.
        #   exp mode:    gamma/2 = i pi Dl / (q0 2^r)  (imaginary)
        #   cosine mode: Dl / (2 q0 (K+1))             (real): the chain
        #     output t then holds (v_a + i v_b)/(2 q0 (K+1)), so the
        #     conjugation sum/difference hands EvalMod y_a and i*y_b with
        #     y_h = v_h/(q0 (K+1)) in [-1, 1].
        # The normalization plaintext stores round(q[base]/2^F): its
        # quantization multiplies y by the EXACTLY KNOWN gamma_n =
        # round(sig_n)/sig_n, which the EvalMod frequency then amplifies
        # by (K+1) q0/Dl — at K=68 the raw 2^-34 rounding alone would
        # floor the refresh at ~7e-5.  Fold 1/gamma_n into the C2S
        # constant (whose 45-bit-scale diagonals quantize ~2^-42) so the
        # norm level is exact by construction.
        gamma_n = 1.0
        if evalmod == "cosine":
            sig_n = float(q[base]) / (2.0 ** F_bits)
            gamma_n = round(sig_n) / sig_n
        # EvalMod WORKING SCALE Dl_em: the refresh error floor is the
        # linear stages' mod-down/rescale rounding (~||s||_1 ~ N
        # coefficient units) amplified by (K+1) * q0 / (EvalMod scale) —
        # at Dl = 2^45 under q0 = 2^59 that's a 2^14 amplification, the
        # measured 4e-2 N=4096 wall (round-5 diagnosis: engine-only noise
        # is 6e-9; F-dilution and PS-quotient growth both measured flat).
        # Run the engine at the native width of ITS OWN chain levels
        # instead: with 59-bit EvalMod primes the amplification collapses
        # to ~(K+1).  Dl_em derives from the first engine level's prime,
        # so a legacy all-45-bit chain reproduces the old behavior
        # exactly; the Dl_em/Dl ratio folds into the C2S constant and the
        # S2C kappa, and the S2C realignment returns the USER scale Dl.
        Dl_em = (float(2 ** int(round(math.log2(float(q[base + 1])))))
                 if evalmod == "cosine" else Dl)
        gtot = (Dl_em * (2.0 ** F_bits)
                / (2.0 * float(q0) * (K + 1) * gamma_n)
                if evalmod == "cosine" else gamma / 2.0)
        gmag = abs(gtot) ** (1.0 / Gn)
        gphase = gtot / abs(gtot)
        cfac = [gphase * gmag] + [gmag] * (Gn - 1)
        c2s_fns = [make_group(_scale_diagonals(g, cfac[gi]), gi, float(q[gi]))
                   for gi, g in enumerate(c2s_groups)]

        if evalmod == "cosine":
            eng_a = ChebyEvalMod(context, cds, q, limbs, L, encoder,
                                 base + 1, Dl_em, cos_coeffs, r, imag=False)
            eng_b = ChebyEvalMod(context, cds, q, limbs, L, encoder,
                                 base + 1, Dl_em, cos_coeffs, r, imag=True)
            assert eng_a.depth == eng_b.depth == em_depth
            assert math.isclose(eng_a.sigma_z, eng_b.sigma_z, rel_tol=1e-9)
            em_a, em_b, sigma_z = eng_a.stage, eng_b.stage, eng_a.sigma_z
        else:
            # EvalMod per half (exp trick).  The chain output holds
            # (gamma/2)(a + i b); gamma is purely imaginary, so
            # conjugation flips its sign and the sum/difference SWAPS:
            #   t - conj(t) = gamma * a        -> em_a constant 1
            #   t + conj(t) = i * gamma * b    -> em_b constant -i
            em_a, sigma_z = make_evalmod(base, Dl, 1.0)
            em_b, _ = make_evalmod(base, Dl, -1j)

        # SlotToCoeff: first group carries kappa (the sin -> frac constant)
        # for the a-half and i*kappa for the b-half, plus the Dl/sigma_z
        # realignment in its encode scale; later groups are scale-neutral.
        # cosine mode's w_h is already the REAL sin(2 pi t_h), so kappa =
        # q0/(2 pi Dl) with no imaginary-part extraction; exp mode's w is
        # exp(2 pi i t) and kappa = q0/(4 i pi Dl) pairs with the
        # conjugation difference in stage_s2c_first.
        kap = (float(q0) / (2.0 * math.pi * Dl) if evalmod == "cosine"
               else complex(q0) / (4j * math.pi * Dl))
        delta1 = float(q[lvl_s2c]) * Dl / sigma_z
        s2c_a = make_group(_scale_diagonals(s2c_groups[0], kap),
                           lvl_s2c, delta1)
        s2c_b = make_group(_scale_diagonals(s2c_groups[0], 1j * kap),
                           lvl_s2c, delta1)
        s2c_rest = [make_group(g, lvl_s2c + gi, float(q[lvl_s2c + gi]))
                    for gi, g in enumerate(s2c_groups[1:], start=1)]
        sigma_out = (sigma_z * delta1) / float(q[lvl_s2c])
        out_cd = cds[lvl_s2c + Gn]
        out_scale = sigma_out

        def stage_raise(ct_data):
            return mod_raise(ct_data, raise_plan)

        def make_c2s_stage(gi):
            fn, idx = c2s_fns[gi]

            def run_g(t, rot_keys_stack):
                return rescale(fn(t, rot_keys_stack[idx]), gi)
            return run_g

        if evalmod == "cosine":
            # real fold at 2^F headroom (see the norm_extra note):
            #   t + conj(t) = 2 Re(t) = 2^F * y_a,
            #   t - conj(t) = 2i Im(t) = 2^F * i * y_b
            # then ONE shared normalization level (value-preserving
            # scale move Dl*2^F -> Dl) dilutes the conjugation
            # key-switch noise by 2^F before it can reach the EvalMod
            # input y.
            pt_norm = np.asarray(encoder.encode(
                1.0, float(q[base]) / (2.0 ** F_bits),
                cds[base].parms_id).data)

            def stage_split(t, conj_key):
                tc = conjugate(t, base, conj_key)
                xa = plain_mul(ct_add(t, tc, base), pt_norm, base)
                xb = plain_mul(ct_sub(t, tc, base), pt_norm, base)
                return rescale(xa, base), rescale(xb, base)

            # EvalMod output is already the real sin — no extraction
            def stage_s2c_first(wa, wb, conj_key, rot_keys_stack):
                fa, ia = s2c_a
                fb, ib = s2c_b
                y = ct_add(fa(wa, rot_keys_stack[ia]),
                           fb(wb, rot_keys_stack[ib]), lvl_s2c)
                return rescale(y, lvl_s2c)
        else:
            def stage_split(t, conj_key):
                tc = conjugate(t, base, conj_key)
                return ct_sub(t, tc, base), ct_add(t, tc, base)

            def stage_s2c_first(wa, wb, conj_key, rot_keys_stack):
                wac = conjugate(wa, lvl_s2c, conj_key)
                wbc = conjugate(wb, lvl_s2c, conj_key)
                xa = ct_sub(wa, wac, lvl_s2c)
                xb = ct_sub(wb, wbc, lvl_s2c)
                fa, ia = s2c_a
                fb, ib = s2c_b
                y = ct_add(fa(xa, rot_keys_stack[ia]),
                           fb(xb, rot_keys_stack[ib]), lvl_s2c)
                return rescale(y, lvl_s2c)

        def make_s2c_stage(gi):
            fn, idx = s2c_rest[gi - 1]
            lvl = lvl_s2c + gi

            def run_g(y, rot_keys_stack):
                return rescale(fn(y, rot_keys_stack[idx]), lvl)
            return run_g

        c2s_stages = [make_c2s_stage(gi) for gi in range(Gn)]
        s2c_stages = [make_s2c_stage(gi) for gi in range(1, Gn)]

        if composed:
            j_raise = jax.jit(stage_raise)
            j_c2s = [jax.jit(g) for g in c2s_stages]
            j_split = jax.jit(stage_split)
            if evalmod == "cosine":
                # the Chebyshev engine's primitives are internally
                # jitted per level; an outer jit would re-inline the
                # whole EvalMod into one monolithic graph (the N=4096
                # graph is ~65 MB of MLIR and OOMs the compile helper)
                j_em_a, j_em_b = em_a, em_b
            else:
                j_em_a = jax.jit(em_a)
                j_em_b = jax.jit(em_b)
            j_s2c0 = jax.jit(stage_s2c_first)
            j_s2c = [jax.jit(g) for g in s2c_stages]

            def run(ct_data, rot_keys_stack, conj_key, relin_key):
                t = j_raise(ct_data)
                for g in j_c2s:
                    t = g(t, rot_keys_stack)
                xa, xb = j_split(t, conj_key)
                wa = j_em_a(xa, relin_key)
                wb = j_em_b(xb, relin_key)
                y = j_s2c0(wa, wb, conj_key, rot_keys_stack)
                for g in j_s2c:
                    y = g(y, rot_keys_stack)
                return y

            return run, out_cd.parms_id, out_scale, rot_steps, conj_elt

        def fn(ct_data, rot_keys_stack, conj_key, relin_key):
            t = stage_raise(ct_data)
            for g in c2s_stages:
                t = g(t, rot_keys_stack)
            xa, xb = stage_split(t, conj_key)
            wa = em_a(xa, relin_key)
            wb = em_b(xb, relin_key)
            y = stage_s2c_first(wa, wb, conj_key, rot_keys_stack)
            for g in s2c_stages:
                y = g(y, rot_keys_stack)
            return y

        return fn, out_cd.parms_id, out_scale, rot_steps, conj_elt

    # ================= dense mode (BSGS slot matrices) ===================
    E, Minv = derive_slot_matrices(encoder)
    # C2S diagonal scale: exactly the two primes its product rescales by
    delta_c2s = float(q[0]) * float(q[1])
    # u_h = W_h @ [z; conj z], W_h = c * Minv rows of half h.  The front
    # constant c: exp mode gamma (EvalMod input 2 pi i t / 2^r); cosine
    # mode Dl/(q0 (K+1)) — both coefficient halves then arrive as the
    # REAL y_h = v_h/(q0 (K+1)) in [-1, 1] and ONE engine serves both.
    gfront = (Dl / (float(q0) * (K + 1)) if evalmod == "cosine" else gamma)
    Wz = [gfront * Minv[:s, :s], gfront * Minv[s:, :s]]      # act on z
    Wc = [gfront * Minv[:s, s:], gfront * Minv[s:, s:]]      # act on conj z

    top_id = top_cd.parms_id
    c2s = []
    rot_steps = None
    for h in range(2):
        fz, steps_z = build_ckks_matvec_bsgs(
            context, _matrix_diagonals(Wz[h]), delta_c2s, encoder,
            parms_id=top_id, baby=baby)
        fc, steps_c = build_ckks_matvec_bsgs(
            context, _matrix_diagonals(Wc[h]), delta_c2s, encoder,
            parms_id=top_id, baby=baby)
        if rot_steps is None:
            rot_steps = steps_z
        if steps_z != rot_steps or steps_c != rot_steps:
            raise AssertionError("BSGS step sets must agree across maps")
        c2s.append((fz, fc))

    # after C2S + two rescales: sigma_u = Dl * delta_c2s / (q0*q1) = Dl
    sigma_u = Dl * delta_c2s / (float(q[0]) * float(q[1]))
    if evalmod == "cosine":
        engine = ChebyEvalMod(context, cds, q, limbs, L, encoder, 2,
                              sigma_u, cos_coeffs, r, imag=False)
        assert engine.depth == em_depth
        stage_evalmod, sigma_z = engine.stage, engine.sigma_z
    else:
        stage_evalmod, sigma_z = make_evalmod(2, sigma_u, 1.0)

    # ---- S2C at level 2 + em_depth ---------------------------------------
    s2c_id = cds[lvl_s2c].parms_id
    delta_s2c = float(q[lvl_s2c]) * float(q[lvl_s2c + 1]) * Dl / sigma_z
    s2c = []
    if evalmod == "cosine":
        # w_h is already the real sin(2 pi t_h) ~ 2 pi Dl alpha_h / q0:
        # ONE matvec per half (kappa E columns of that half), no
        # conjugation / imaginary-part extraction needed.
        kap = float(q0) / (2 * math.pi * Dl)
        Ch = [kap * E[:, :s], kap * E[:, s:]]                 # act on w_h
        for h in range(2):
            fz, steps_z = build_ckks_matvec_bsgs(
                context, _matrix_diagonals(Ch[h]), delta_s2c, encoder,
                parms_id=s2c_id, baby=baby)
            if steps_z != rot_steps:
                raise AssertionError("BSGS step sets must agree across maps")
            s2c.append((fz, None))
    else:
        kap = float(q0) / (2 * math.pi * Dl) / 2j
        Cz = [kap * E[:, :s], kap * E[:, s:]]                 # act on w_h
        Cc = [-kap * E[:, :s], -kap * E[:, s:]]               # act on conj w_h
        for h in range(2):
            fz, steps_z = build_ckks_matvec_bsgs(
                context, _matrix_diagonals(Cz[h]), delta_s2c, encoder,
                parms_id=s2c_id, baby=baby)
            fc, steps_c = build_ckks_matvec_bsgs(
                context, _matrix_diagonals(Cc[h]), delta_s2c, encoder,
                parms_id=s2c_id, baby=baby)
            if steps_z != rot_steps or steps_c != rot_steps:
                raise AssertionError("BSGS step sets must agree across maps")
            s2c.append((fz, fc))
    out_cd = cds[lvl_s2c + 2]
    out_scale = sigma_z * delta_s2c / (float(q[lvl_s2c]) *
                                       float(q[lvl_s2c + 1]))

    # ---- stages ---------------------------------------------------------
    def stage_raise(ct_data, conj_key):
        z = mod_raise(ct_data, raise_plan)                    # top level
        return z, conjugate(z, 0, conj_key)

    def stage_c2s(h, z, zc, rot_keys_stack):
        fz, fc = c2s[h]
        u = add_poly(fz(z, rot_keys_stack),
                     fc(zc, rot_keys_stack), limbs[0])
        return rescale(rescale(u, 0), 1)                      # level 2

    def stage_s2c(h, w, conj_key, rot_keys_stack):
        fz, fc = s2c[h]
        if fc is None:                         # cosine: w is real already
            return fz(w, rot_keys_stack)
        wc = conjugate(w, lvl_s2c, conj_key)
        return add_poly(fz(w, rot_keys_stack),
                        fc(wc, rot_keys_stack), limbs[lvl_s2c])

    def stage_out(t0, t1):
        out = add_poly(t0, t1, limbs[lvl_s2c])
        return rescale(rescale(out, lvl_s2c), lvl_s2c + 1)

    if composed:
        # per-stage jitted programs: seconds of compile each instead of a
        # single deep graph (PERF.md compile-time note).  stage_evalmod
        # compiles ONCE and serves both halves (cosine mode: the engine
        # is internally jitted per level — see the split-mode note).
        j_raise = jax.jit(stage_raise)
        j_c2s = [jax.jit(lambda z, zc, ks, h=h: stage_c2s(h, z, zc, ks))
                 for h in range(2)]
        j_evalmod = (stage_evalmod if evalmod == "cosine"
                     else jax.jit(stage_evalmod))
        j_s2c = [jax.jit(lambda w, ck, ks, h=h: stage_s2c(h, w, ck, ks))
                 for h in range(2)]
        j_out = jax.jit(stage_out)

        def run(ct_data, rot_keys_stack, conj_key, relin_key):
            z, zc = j_raise(ct_data, conj_key)
            terms = []
            for h in range(2):
                u = j_c2s[h](z, zc, rot_keys_stack)
                w = j_evalmod(u, relin_key)
                terms.append(j_s2c[h](w, conj_key, rot_keys_stack))
            return j_out(terms[0], terms[1])

        return run, out_cd.parms_id, out_scale, rot_steps, conj_elt

    def fn(ct_data, rot_keys_stack, conj_key, relin_key):
        z, zc = stage_raise(ct_data, conj_key)
        terms = []
        for h in range(2):
            u = stage_c2s(h, z, zc, rot_keys_stack)
            w = stage_evalmod(u, relin_key)
            terms.append(stage_s2c(h, w, conj_key, rot_keys_stack))
        return stage_out(terms[0], terms[1])

    return fn, out_cd.parms_id, out_scale, rot_steps, conj_elt
