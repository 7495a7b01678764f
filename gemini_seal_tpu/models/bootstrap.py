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
      |  CoeffToSlot          2x (A z + B conj z) BSGS matvecs: slots of
      |                       two cts hold u_h = (2 pi i / 2^r) (v_h / q0)
      |                       for the two coefficient halves v_h
      |  EvalMod              exp trick: degree-7 Taylor of exp(u) then r
      |                       double-angle squarings -> exp(2 pi i t);
      |                       sin(2 pi t)/2 pi ~= frac(t) = m/q0
      |  SlotToCoeff          4x BSGS matvecs fold the q0/(2 pi) constant,
      |                       the imaginary-part extraction AND the
      |                       slot->coefficient map into one linear layer
      v
    fresh ct near the TOP of the chain, same message, same scale

All linear maps ride build_ckks_matvec_bsgs (~2*sqrt(slots) key switches
each, complex diagonals, hoisted mod-up); the squarings are the standard
fused square+relin+rescale pipeline.  The slot-map matrices are derived
NUMERICALLY from the encoder's own embedding (no closed-form DFT code to
get subtly wrong): E = embedding_forward(I_n) column-gathered through the
generator-5 index map, inverted once on the host.

Precision: the floor is the squaring-chain rescale noise AMPLIFIED by
the final q0/(2 pi scale) division that turns exp(2 pi i t) back into
m — output error tracks q0/scale, i.e. every extra bit of working-prime
width buys one bit of refresh accuracy (measured e2e at N=128, r=8,
59-bit q0: 1.4e-2 max error with 40-bit primes, ~2e-4 with 45-bit).
The sin cubic term (relative ~(2 pi |m| scale/q0)^2/6) and the deg-7
Taylor tail (<1e-7 at arg <= 0.35 rad) sit far below that floor.
The secret is SEAL's DENSE ternary key, so the mod-raise
overflow bound K is ~4.5*sqrt(N/18) (empirical, tools: /tmp-level sim),
larger than sparse-key HEAAN's; r = ceil(log2(2 pi (K+1.5)/0.15))
double-angle squarings keep the Taylor argument below 0.15 rad.

Level cost: 2 (C2S) + 4 (deg-7 Taylor incl. its closing rescale) +
r (squarings) + 2 (S2C) = 8 + r.
"""

from __future__ import annotations

import math

import numpy as np

from ..context import SealContext
from ..ops.backend import xp
from ..ops.dyadic import add_poly, dyadic_product
from ..ops.keyswitch import KeySwitchPlan, switch_key
from ..ops.ntt import ntt_forward, ntt_inverse
from ..ops.rnsops import divide_and_round_q_last_ntt
from .pipelines import build_ckks_matvec_bsgs, build_ckks_mul_relin_rescale

__all__ = [
    "derive_slot_matrices",
    "mod_raise",
    "build_ckks_bootstrap",
]


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
                         composed: bool = True):
    """fn(ct_data, rot_keys_stack, conj_key, relin_key) -> refreshed ct.

    ct_data: u64[..., 2, 1, N] at the LAST level of the chain (NTT form)
    with the given `scale`; the output is u64[..., 2, L_out, N] at
    `out_parms_id` — 8 + r levels below the top — encrypting the SAME
    slot values at the SAME scale, ready for further multiplications.

    Returns (fn, out_parms_id, out_scale, rot_steps, conj_elt):
    rot_keys_stack stacked for `rot_steps` (the shared BSGS baby/giant
    set), conj_key stacked for the single conjugation element 2N-1.

    composed=True (default): fn is an already-compiled Python callable
    chaining per-stage jitted programs (ModRaise+conj, one C2S and one
    S2C program per coefficient half, ONE shared EvalMod program) —
    seconds of compile each; composed=False returns one jittable
    function (a single very deep XLA graph: tens of minutes of one-time
    compile — only for fusion experiments).  Outputs are bit-identical.

    Requirements: the chain's base prime q0 must be >> scale (precision
    ~ (2 pi * scale * msg_bound / q0)^2 / 6 relative), the special-prime
    budget must cover top-level key switches, and slot magnitudes must
    stay within msg_bound.
    """
    import jax.numpy as jnp

    n = encoder._n
    s = encoder.slots
    if K is None:
        K = max(12, int(math.ceil(4.5 * math.sqrt(n / 18.0))))
    if r is None:
        r = int(math.ceil(math.log2(2 * math.pi * (K + 1.5) / 0.15)))

    # ---- chain walk: top -> levels used by each stage -------------------
    cds = [context.get_context_data(context.first_parms_id)]
    n_levels = 8 + r
    for _ in range(n_levels):
        nxt = cds[-1].next_context_data
        if nxt is None:
            raise ValueError(
                f"modulus chain too short: bootstrap needs {n_levels} "
                f"levels below the top (r={r} squarings)")
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

    # ---- slot matrices --------------------------------------------------
    E, Minv = derive_slot_matrices(encoder)
    Dl = float(scale)
    gamma = 2j * math.pi * Dl / (float(q0) * float(2 ** r))
    # C2S diagonal scale: exactly the two primes its product rescales by
    delta_c2s = float(q[0]) * float(q[1])
    # u_h = W_h @ [z; conj z], W_h = gamma * Minv rows of half h
    Wz = [gamma * Minv[:s, :s], gamma * Minv[s:, :s]]        # act on z
    Wc = [gamma * Minv[:s, s:], gamma * Minv[s:, s:]]        # act on conj z

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

    # ---- scale ladder ---------------------------------------------------
    # after C2S + two rescales: sigma_u = Dl * delta_c2s / (q0*q1) = Dl
    sigma_u = Dl * delta_c2s / (float(q[0]) * float(q[1]))
    sq = {}
    for lvl in (2, 3):                                        # u2 = u^2, u4 = u2^2
        sq[lvl] = build_ckks_mul_relin_rescale(
            context, cds[lvl].parms_id, square=True)
    mul3 = build_ckks_mul_relin_rescale(context, cds[3].parms_id)
    mul_hi = build_ckks_mul_relin_rescale(context, cds[4].parms_id)
    sigma_u2 = sigma_u * sigma_u / float(q[2])                # level 3
    sigma_u3 = sigma_u2 * sigma_u / float(q[3])               # level 4
    sigma_u4 = sigma_u2 * sigma_u2 / float(q[3])              # level 4
    # sigma_hi = Dl^2 keeps every alignment constant's encode scale near
    # Dl (sigma_hi = Dl would push them to ~1, rounding a_k to garbage);
    # the resulting ~Dl^2-scaled w gets one closing rescale to ~Dl.
    sigma_hi = Dl * Dl
    sigma_w = sigma_u4 * sigma_hi / float(q[4])               # level 5

    # Taylor coefficients of exp: a_k = 1/k!
    a = [1.0 / math.factorial(k) for k in range(8)]

    def _enc(val, sc, lvl):
        return np.asarray(encoder.encode(val, sc, cds[lvl].parms_id).data)

    # hi = a4 + a5 u + a6 u2 + a7 u3, all aligned at level 4, scale sigma_hi
    hi_u = _enc(a[5], sigma_hi / sigma_u, 4)
    hi_u2 = _enc(a[6], sigma_hi / sigma_u2, 4)
    hi_u3 = _enc(a[7], sigma_hi / sigma_u3, 4)
    hi_c = _enc(a[4], sigma_hi, 4)
    # low = a0 + a1 u + a2 u2 + a3 u3, aligned at level 5, scale sigma_w
    lo_u = _enc(a[1], sigma_w / sigma_u, 5)
    lo_u2 = _enc(a[2], sigma_w / sigma_u2, 5)
    lo_u3 = _enc(a[3], sigma_w / sigma_u3, 5)
    lo_c = _enc(a[0], sigma_w, 5)

    sigma_w6 = sigma_w / float(q[5])                          # level 6

    # squarings: level 6 -> 6 + r
    sq_r = [build_ckks_mul_relin_rescale(context, cds[6 + i].parms_id,
                                         square=True) for i in range(r)]
    sigma_z = sigma_w6
    for i in range(r):
        sigma_z = sigma_z * sigma_z / float(q[6 + i])

    # ---- S2C at level 6 + r --------------------------------------------
    lvl_s2c = 6 + r
    s2c_id = cds[lvl_s2c].parms_id
    delta_s2c = float(q[lvl_s2c]) * float(q[lvl_s2c + 1]) * Dl / sigma_z
    kap = float(q0) / (2 * math.pi * Dl) / 2j
    Cz = [kap * E[:, :s], kap * E[:, s:]]                     # act on w_h
    Cc = [-kap * E[:, :s], -kap * E[:, s:]]                   # act on conj w_h
    s2c = []
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

    # ---- conjugation (galois element 2n - 1) ---------------------------
    conj_elt = 2 * n - 1
    conj_plans = {lvl: KeySwitchPlan(context, cds[lvl].parms_id)
                  for lvl in (0, lvl_s2c)}
    galois_tools = {lvl: cds[lvl].galois_tool for lvl in (0, lvl_s2c)}

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

    # ---- stages ---------------------------------------------------------
    def stage_raise(ct_data, conj_key):
        z = mod_raise(ct_data, raise_plan)                    # top level
        return z, conjugate(z, 0, conj_key)

    def stage_c2s(h, z, zc, rot_keys_stack):
        fz, fc = c2s[h]
        u = add_poly(fz(z, rot_keys_stack),
                     fc(zc, rot_keys_stack), limbs[0])
        return rescale(rescale(u, 0), 1)                      # level 2

    def stage_evalmod(u, relin_key):
        """Degree-7 Taylor of exp(u) + r double-angle squarings (the same
        program for both coefficient halves)."""
        u2 = sq[2](u, relin_key)                              # level 3
        u3 = mul3(u2, u[..., :L[3], :], relin_key)            # level 4
        u4 = sq[3](u2, relin_key)                             # level 4
        hi = plain_mul(u[..., :L[4], :], hi_u, 4)
        hi = add_poly(hi, plain_mul(u2[..., :L[4], :], hi_u2, 4),
                      limbs[4])
        hi = add_poly(hi, plain_mul(u3, hi_u3, 4), limbs[4])
        hi = plain_add(hi, hi_c, 4)
        w = mul_hi(u4, hi, relin_key)                         # level 5
        lo = plain_mul(u[..., :L[5], :], lo_u, 5)
        lo = add_poly(lo, plain_mul(u2[..., :L[5], :], lo_u2, 5),
                      limbs[5])
        lo = add_poly(lo, plain_mul(u3[..., :L[5], :], lo_u3, 5),
                      limbs[5])
        lo = plain_add(lo, lo_c, 5)
        w = add_poly(w, lo, limbs[5])
        w = rescale(w, 5)                                     # level 6, ~Dl
        for i in range(r):
            w = sq_r[i](w, relin_key)                         # level 7+i
        return w

    def stage_s2c(h, w, conj_key, rot_keys_stack):
        fz, fc = s2c[h]
        wc = conjugate(w, lvl_s2c, conj_key)
        return add_poly(fz(w, rot_keys_stack),
                        fc(wc, rot_keys_stack), limbs[lvl_s2c])

    def stage_out(t0, t1):
        out = add_poly(t0, t1, limbs[lvl_s2c])
        return rescale(rescale(out, lvl_s2c), lvl_s2c + 1)

    if composed:
        # per-stage jitted programs: seconds of compile each instead of a
        # single deep graph (PERF.md compile-time note; same prescription
        # as build_ckks_poly_eval's composed mode).  stage_evalmod
        # compiles ONCE and serves both halves.
        import jax

        j_raise = jax.jit(stage_raise)
        j_c2s = [jax.jit(lambda z, zc, ks, h=h: stage_c2s(h, z, zc, ks))
                 for h in range(2)]
        j_evalmod = jax.jit(stage_evalmod)
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
