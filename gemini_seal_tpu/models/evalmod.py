"""Chebyshev-cosine EvalMod for CKKS bootstrapping.

The bootstrap's modular-reduction stage must turn slots holding
t = v/q0 (v = m + q0*I the mod-raised coefficients, |I| <= K) into
slots holding frac(t) ~ m/q0.  The round-3 implementation used the exp
trick: deg-7 Taylor of exp(i theta) at |theta| <= 0.15 rad followed by
r = ceil(log2(2 pi (K+1.5)/0.15)) double-angle squarings (r = 12 at
N=4096).  Each squaring DOUBLES the phase error, so the refresh error
floor is the rescale/encode noise amplified by 2^r * q0/(2 pi scale) —
measured 1.4e-2 at 40-bit primes (PERF.md).

This module replaces it with the published-practice cosine approach
(Han-Ki "Better Bootstrapping", Bossuat et al. / Lattigo):

    y = t/(K+1) in [-1, 1]                 (folded into CoeffToSlot)
    h_0 = P(y) ~ cos((2 pi (K+1) y - pi/2)/2^r)   Chebyshev, deg d
    h_{j+1} = 2 h_j^2 - 1                  r double-angle squarings
    h_r = cos(2 pi t - pi/2) = sin(2 pi t) ~ 2 pi m / q0

with r = 3..4 instead of 10..12: the noise amplification drops by
2^(r_old - r_new) ~ 2 orders of magnitude, and the level cost
(ceil(log2(d+1)) + 1 + r) undercuts the Taylor chain's 4 + r_old.
The Chebyshev degree needed is d ~ c + O(c^(1/3)), c = 2 pi (K+1)/2^r
(Bessel-coefficient decay of cos under the Chebyshev expansion), found
numerically by `fit_cos_cheby` — no closed-form constants to get wrong.

Homomorphic evaluation is Paterson-Stockmeyer over the Chebyshev basis
(baby steps T_1..T_m, giant powers T_{m 2^j} by double-angle, recursive
chebdiv splits p = q*T_g + rem), with EXACT scale tracking: every
ciphertext node carries its (level, scale) as floats; where the basis
recurrence needs a subtraction at a scale the operand does not have, an
alignment plain-mult by encode(1.0, scale_target*q_l/scale_have)
followed by one rescale matches scales exactly (float-roundoff 1e-16,
far below encode noise) — the device never sees an approximate-scale
addition.  Leaf linear combinations need no alignment at all: each
coefficient's encode scale compensates its basis element individually.

Two input conventions (`imag`):
- imag=False: the ciphertext's slots hold y itself (real).
- imag=True: the slots hold i*y.  The engine then evaluates in the
  twisted basis V_k(z) := i^k T_k(-i z) (so V_1 = z, the ciphertext we
  actually have).  The T-identities survive composition with sign/phase
  twists only: V_{2k} = 2 V_k^2 - (-1)^k, V_{a+b} = 2 V_a V_b -
  (-1)^{min(a,b)} V_{|a-b|}, and T_k(y) = i^{-k} V_k(z) — so real
  cosine evaluation on an i*y input costs NO extra level (the phase
  twists fold into plaintext coefficients and +-signs).  Split-mode
  bootstrapping needs this: its conjugation extraction hands one
  coefficient half over as i*y (models/bootstrap.py).

No reference analogue: SEAL 3.5 / the Gemini-SEAL fork stop at leveled
CKKS (no bootstrapping of any kind).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["fit_cos_cheby", "choose_r", "plan_evalmod", "ChebyEvalMod"]


def fit_cos_cheby(K: int, r: int, tol: float = 1e-12, max_degree: int = 2046):
    """Chebyshev-basis coefficients (numpy convention, index = T-degree)
    of f(y) = cos((2 pi (K+1) y - pi/2) / 2^r) on y in [-1, 1], trimmed
    at relative `tol`.  Uses Chebyshev-point interpolation (numerically
    the FFT of f at the nodes — exact to float precision).

    tol default 1e-12: the fit residual reaches the bootstrap output
    multiplied by ~4^r * q0/(2 pi scale) * O(sqrt(n)) (the double-angle
    slope, the SlotToCoeff kappa, and coherent matvec accumulation) —
    at q0/scale = 2^14 that's ~10^4-10^5, so a 1e-9 fit already costs
    ~1e-4 of refresh error in EXACT arithmetic (measured in the numpy
    simulation) while 1e-12 buys ~1e-8 at the SAME Chebyshev depth
    (the Bessel tail decays super-exponentially: +4-6 degree only)."""
    from numpy.polynomial import chebyshev as C

    c_arg = 2.0 * math.pi * (K + 1) / (2.0 ** r)
    deg = int(c_arg + 24.0 * max(c_arg, 1.0) ** (1.0 / 3.0) + 32)

    def f(y):
        return np.cos((2.0 * math.pi * (K + 1) * y - math.pi / 2.0)
                      / (2.0 ** r))

    while True:
        coeffs = C.chebinterpolate(f, deg)
        mx = np.abs(coeffs).max()
        keep = np.nonzero(np.abs(coeffs) > tol * mx)[0]
        if keep.size and keep[-1] < deg - 4:
            return coeffs[: keep[-1] + 1]
        if deg >= max_degree:
            raise ValueError(
                f"cos Chebyshev fit did not converge by degree {deg} "
                f"(K={K}, r={r})")
        deg = min(2 * deg, max_degree)


def _plan_lt(d: int):
    """(l, t): baby size m = 2^l, t giant doubling levels, 2^(l+t) > d.
    Balanced split minimizes multiplications ~ m + d/m."""
    if d < 1:
        return 1, 0
    D0 = max(1, int(math.ceil(math.log2(d + 1))))
    l = max(1, D0 // 2)
    t = max(0, D0 - l)
    while (1 << (l + t)) <= d:
        t += 1
    return l, t


def choose_r(K: int, r: int = None, tol: float = 1e-12):
    """Pick the double-angle count: smallest total level cost
    ceil-split depth + 1 + r, tie-broken toward SMALLER r (every halving
    of 2^r halves the noise amplification).  Returns (r, coeffs)."""
    if r is not None:
        return r, fit_cos_cheby(K, r, tol)
    best = None
    for rr in range(2, 13):
        coeffs = fit_cos_cheby(K, rr, tol)
        d = len(coeffs) - 1
        l, t = _plan_lt(d)
        key = (l + t + 1 + rr, rr)
        if best is None or key < best[0]:
            best = (key, rr, coeffs)
    return best[1], best[2]


def plan_evalmod(K: int, r: int = None, tol: float = 1e-12):
    """(r, coeffs, depth): everything build_ckks_bootstrap needs to walk
    the modulus chain BEFORE constructing the engine.  depth = levels
    consumed from the engine's input level to its output level."""
    r, coeffs = choose_r(K, r, tol)
    l, t = _plan_lt(len(coeffs) - 1)
    return r, coeffs, l + t + 1 + r


class _Node:
    """Build-time handle: a ciphertext-producing closure with its exact
    (level, scale) bookkeeping.  run(env) -> u64[..., 2, L, N]; results
    are memoized per invocation through env['cache']."""

    __slots__ = ("lvl", "sigma", "_run")

    def __init__(self, lvl, sigma, run):
        self.lvl = lvl
        self.sigma = float(sigma)
        self._run = run

    def run(self, env):
        out = env["cache"].get(id(self))
        if out is None:
            out = self._run(env)
            env["cache"][id(self)] = out
        return out


class ChebyEvalMod:
    """Builds stage(u, relin_key) evaluating sin(2 pi (K+1) y) from a
    ciphertext whose slots hold y (imag=False) or i*y (imag=True), at
    level `base` and scale `Dl`.  Exposes:

      .stage     the jittable callable
      .sigma_z   exact output scale (floats tracked through every op)
      .depth     levels consumed (output level = base + depth)
      .r, .degree, .n_ct_mults   diagnostics
    """

    def __init__(self, context, cds, q, limbs, L, encoder, base: int,
                 Dl: float, coeffs, r: int, imag: bool):
        import jax
        import jax.numpy as jnp

        from ..ops.dyadic import add_poly, dyadic_product, sub_poly
        from ..ops.rnsops import divide_and_round_q_last_ntt
        from .pipelines import build_ckks_mul_relin_rescale

        self._ctx = context
        self._cds = cds
        self._q = q
        self._limbs = limbs
        self._L = L
        self._enc = encoder
        self._imag = bool(imag)
        self.r = int(r)
        self._jax = jax
        self._jnp = jnp
        self._add_poly = add_poly
        self._sub_poly = sub_poly
        self._dyadic = dyadic_product
        self._div_qlast = divide_and_round_q_last_ntt
        self._build_mul = build_ckks_mul_relin_rescale
        # Per-level SHARED jitted primitives: composed callers then compile
        # ~6 small programs per level instead of one monolithic EvalMod
        # graph (the N=4096 whole-stage graph is ~65 MB of MLIR and OOMs
        # the compile helper); plaintext constants are passed as runtime
        # device-resident args so every leaf shares one program.  Under an
        # outer jit the inner jits inline — both usage modes stay valid.
        self._muls = {}
        self._sqs = {}
        self._adds = {}
        self._subs = {}
        self._pmuls = {}
        self._padds = {}
        self._rescales = {}
        self._basis = {}
        self.n_ct_mults = 0

        coeffs = np.asarray(coeffs, dtype=np.complex128)
        d = len(coeffs) - 1
        self.degree = d
        self._l, self._t = _plan_lt(d)
        self._m = 1 << self._l
        self._giants = [self._m << j for j in range(max(self._t, 1))]

        u_node = _Node(base, Dl, lambda env: env["u"])
        self._basis[1] = u_node
        out_lvl = base + self._l + self._t + 1
        poly_node = self._eval(coeffs, out_lvl, Dl)

        # r double-angle squarings: h <- 2 h^2 - 1 (values are genuine
        # cos by construction — the tracked scale absorbs all constants)
        node = poly_node
        for _ in range(self.r):
            sq = self._ct_square(node)
            dbl = self._ct_add(sq, sq)
            node = self._plain_add_const(dbl, -1.0)
        self._root = node
        self.depth = node.lvl - base
        self.sigma_z = node.sigma

        def stage(u, relin_key):
            env = {"u": u, "rk": relin_key, "cache": {}}
            return self._root.run(env)

        self.stage = stage

    # ---- primitive ops (build-time: return _Node) ------------------------

    def _mul_fn(self, lvl):
        fn = self._muls.get(lvl)
        if fn is None:
            raw = self._build_mul(self._ctx, self._cds[lvl].parms_id)
            nL = self._L[lvl]
            fn = self._jax.jit(
                lambda a, b, rk: raw(a[..., :nL, :], b[..., :nL, :], rk))
            self._muls[lvl] = fn
        return fn

    def _sq_fn(self, lvl):
        fn = self._sqs.get(lvl)
        if fn is None:
            raw = self._build_mul(self._ctx, self._cds[lvl].parms_id,
                                  square=True)
            nL = self._L[lvl]
            fn = self._jax.jit(lambda a, rk: raw(a[..., :nL, :], rk))
            self._sqs[lvl] = fn
        return fn

    def _addsub_fn(self, lvl, sub):
        store = self._subs if sub else self._adds
        fn = store.get(lvl)
        if fn is None:
            op = self._sub_poly if sub else self._add_poly
            lim = self._limbs[lvl]
            nL = self._L[lvl]
            fn = self._jax.jit(
                lambda x, y: op(x[..., :nL, :], y[..., :nL, :], lim))
            store[lvl] = fn
        return fn

    def _pmul_fn(self, lvl):
        fn = self._pmuls.get(lvl)
        if fn is None:
            lim = self._limbs[lvl]
            nL = self._L[lvl]
            dy = self._dyadic
            jnp = self._jnp

            def raw(x, pt):
                x = x[..., :nL, :]
                return jnp.stack([dy(x[..., 0, :, :], pt, lim),
                                  dy(x[..., 1, :, :], pt, lim)], axis=-3)
            fn = self._jax.jit(raw)
            self._pmuls[lvl] = fn
        return fn

    def _padd_fn(self, lvl):
        fn = self._padds.get(lvl)
        if fn is None:
            lim = self._limbs[lvl]
            nL = self._L[lvl]
            ap = self._add_poly
            jnp = self._jnp

            def raw(x, pt):
                x = x[..., :nL, :]
                c0 = ap(x[..., 0, :, :], pt, lim)
                return jnp.concatenate(
                    [c0[..., None, :, :], x[..., 1:, :, :]], axis=-3)
            fn = self._jax.jit(raw)
            self._padds[lvl] = fn
        return fn

    def _rescale_fn(self, lvl):
        fn = self._rescales.get(lvl)
        if fn is None:
            cd = self._cds[lvl]
            dq = self._div_qlast
            nL = self._L[lvl]
            fn = self._jax.jit(
                lambda x: dq(x[..., :nL, :], cd.device_rns_tool,
                             cd.ntt_tables))
            self._rescales[lvl] = fn
        return fn

    def _dev(self, pt):
        """Constants live on-device once (no per-call upload)."""
        return self._jax.device_put(pt)

    def _ct_mul(self, a, b):
        lvl = max(a.lvl, b.lvl)
        fn = self._mul_fn(lvl)
        self.n_ct_mults += 1
        sigma = a.sigma * b.sigma / float(self._q[lvl])
        return _Node(lvl + 1, sigma,
                     lambda env: fn(a.run(env), b.run(env), env["rk"]))

    def _ct_square(self, a):
        fn = self._sq_fn(a.lvl)
        self.n_ct_mults += 1
        sigma = a.sigma * a.sigma / float(self._q[a.lvl])
        return _Node(a.lvl + 1, sigma,
                     lambda env: fn(a.run(env), env["rk"]))

    def _ct_add(self, a, b, sub=False):
        if a.lvl != b.lvl:
            raise AssertionError("level mismatch in ct add")
        if not math.isclose(a.sigma, b.sigma, rel_tol=1e-9):
            raise AssertionError(
                f"scale mismatch in ct add: {a.sigma} vs {b.sigma}")
        fn = self._addsub_fn(a.lvl, sub)
        return _Node(a.lvl, a.sigma,
                     lambda env: fn(a.run(env), b.run(env)))

    def _encode(self, value, sigma, lvl):
        """Host-encode a constant (float or complex) at exact scale."""
        if isinstance(value, complex) and value.imag == 0.0:
            value = value.real
        pt = self._enc.encode(value, float(sigma), self._cds[lvl].parms_id)
        return np.asarray(pt.data)

    def _plain_mul_node(self, node, pt_data, lvl, sigma_out):
        fn = self._pmul_fn(lvl)
        pt = self._dev(pt_data)
        return _Node(lvl, sigma_out,
                     lambda env: fn(node.run(env), pt))

    def _plain_add_const(self, node, value):
        pt = self._dev(self._encode(value, node.sigma, node.lvl))
        fn = self._padd_fn(node.lvl)
        return _Node(node.lvl, node.sigma,
                     lambda env: fn(node.run(env), pt))

    def _rescale(self, node, lvl, sigma):
        """node at level lvl -> node at lvl+1, scale sigma/q[lvl]."""
        fn = self._rescale_fn(lvl)
        return _Node(lvl + 1, sigma / float(self._q[lvl]),
                     lambda env: fn(node.run(env)))

    def _align(self, node, lvl, sigma):
        """Value-preserving move to exactly (lvl, sigma): plain-mult by
        encode(1.0, sigma*q/sigma_have) + one rescale."""
        if node.lvl == lvl and math.isclose(node.sigma, sigma,
                                            rel_tol=1e-12):
            return node
        if node.lvl > lvl - 1:
            raise AssertionError("alignment needs one level of headroom")
        s_pt = sigma * float(self._q[lvl - 1]) / node.sigma
        pt = self._encode(1.0, s_pt, lvl - 1)
        pm = self._plain_mul_node(node, pt, lvl - 1, node.sigma * s_pt)
        out = self._rescale(pm, lvl - 1, pm.sigma)
        if not math.isclose(out.sigma, sigma, rel_tol=1e-9):
            raise AssertionError("alignment scale bookkeeping broke")
        return out

    # ---- Chebyshev basis --------------------------------------------------

    def _kappa(self, k):
        """Doubling/echo constant: T-basis 1; V-basis (-1)^k."""
        return (-1.0) ** k if self._imag else 1.0

    def _V(self, k):
        """Basis ciphertext for T_k (imag=False) or V_k = i^k T_k(-iz)
        (imag=True), built by balanced product recurrences."""
        node = self._basis.get(k)
        if node is not None:
            return node
        if k % 2 == 0:
            half = self._V(k // 2)
            sq = self._ct_square(half)
            dbl = self._ct_add(sq, sq)
            node = self._plain_add_const(dbl, -self._kappa(k // 2))
        else:
            a, b = (k + 1) // 2, k // 2
            prod = self._ct_mul(self._V(a), self._V(b))
            dbl = self._ct_add(prod, prod)
            echo = self._align(self._V(a - b), dbl.lvl, dbl.sigma)
            kap = self._kappa(b)
            node = self._ct_add(dbl, echo, sub=(kap > 0))
        self._basis[k] = node
        return node

    # ---- Paterson-Stockmeyer recursion -------------------------------------

    def _leaf(self, coeffs, lvl, sigma):
        """Linear combination sum_k coeffs[k] T_k(y) directly from basis
        elements; every plaintext's encode scale individually compensates
        its basis element's scale, so no alignments are needed."""
        terms = None
        for k in range(1, len(coeffs)):
            c = complex(coeffs[k])
            if c == 0.0:
                continue
            if self._imag:
                c *= (-1j) ** (k % 4)          # i^{-k}
            vk = self._V(k)
            if vk.lvl > lvl - 1:
                raise AssertionError("basis element deeper than leaf level")
            s_pt = sigma * float(self._q[lvl - 1]) / vk.sigma
            pt = self._encode(c, s_pt, lvl - 1)
            node = self._plain_mul_node(vk, pt, lvl - 1, vk.sigma * s_pt)
            terms = node if terms is None else self._ct_add(terms, node)
        if terms is None:
            # constant polynomial: encode it directly as a "ciphertext"
            # shaped transparent term — handled by the caller adding c0;
            # produce an exact zero at the right shape via u*0 is wasteful,
            # so just return the constant folded into a zero-free path:
            raise AssertionError("leaf with no linear terms — degree-0 "
                                 "polynomials should be folded upstream")
        out = self._rescale(terms, lvl - 1, terms.sigma)
        c0 = complex(coeffs[0])
        if c0 != 0.0:
            out = self._plain_add_const(out, c0)
        if not math.isclose(out.sigma, sigma, rel_tol=1e-9):
            raise AssertionError("leaf scale bookkeeping broke")
        return out

    def _eval(self, coeffs, lvl, sigma):
        """Ciphertext node computing sum_k coeffs[k] T_k(y) at exactly
        (lvl, sigma).  coeffs: complex T-basis vector."""
        coeffs = np.asarray(coeffs, dtype=np.complex128)
        nz = np.nonzero(np.abs(coeffs) > 0)[0]
        if nz.size == 0 or nz[-1] == 0:
            raise AssertionError("degree-0 evaluation should be folded "
                                 "upstream")
        d = int(nz[-1])
        coeffs = coeffs[: d + 1]
        fits = [g for g in self._giants if g <= d]
        if d < self._m or not fits:
            return self._leaf(coeffs, lvl, sigma)
        from numpy.polynomial import chebyshev as C

        g = max(fits)
        tg = np.zeros(g + 1)
        tg[g] = 1.0
        qv, rv = C.chebdiv(coeffs, tg)
        # Divide by 2*T_g instead of T_g: chebdiv's quotient carries a
        # factor-2 coefficient growth per recursion level (T_a T_b =
        # (T_{a+b} + T_{|a-b|})/2), which compounds to ~deg/m at the top
        # of the tree — the round-5 measured noise floor at degree 152
        # (K=68) was 13x the degree-46 floor from exactly this.  Halving
        # the quotient keeps every recursive coefficient vector O(1);
        # the missing 2 returns as one ciphertext ADD of the product
        # (value-exact, scale-free).
        qv = qv * 0.5
        vg = self._V(g)
        if self._imag:
            qv = qv * ((-1j) ** (g % 4))       # i^{-g} phase fold
        sigma_q = sigma * float(self._q[lvl - 1]) / vg.sigma
        qnz = np.nonzero(np.abs(qv) > 0)[0]
        if qnz.size == 0 or qnz[-1] == 0:
            # degree-0 quotient (d == g): fold it into one plaintext mult
            c = 2.0 * complex(qv[0]) if qnz.size else 0.0
            pt = self._encode(c, sigma_q, lvl - 1)
            pm = self._plain_mul_node(vg, pt, lvl - 1, vg.sigma * sigma_q)
            M = self._rescale(pm, lvl - 1, pm.sigma)
        else:
            Q = self._eval(qv, lvl - 1, sigma_q)
            fn = self._mul_fn(lvl - 1)
            self.n_ct_mults += 1
            Mh = _Node(lvl, sigma_q * vg.sigma / float(self._q[lvl - 1]),
                       lambda env: fn(Q.run(env), vg.run(env), env["rk"]))
            M = self._ct_add(Mh, Mh)           # the folded factor 2
        rv = np.asarray(rv, dtype=np.complex128)
        if np.abs(rv).max() == 0.0:
            return M
        if np.nonzero(np.abs(rv) > 0)[0][-1] == 0:
            return self._plain_add_const(M, complex(rv[0]))
        R = self._eval(rv, lvl, sigma)
        return self._ct_add(M, R)
