"""DeviceEvaluator: the SEAL-style op API at device speed.

The eager `Evaluator` runs exact numpy on the host plane — right for
correctness work, ~100x too slow for serving.  DeviceEvaluator mirrors its
surface but executes every op as ONE cached jitted XLA program and keeps
ciphertext data resident on the device between calls: the per-op dispatch
cost is one executable launch, not a per-primitive round trip.

Compiled executables are cached per (op, parms_id, operand shape) — the
modulus-switching chain gives each level static shapes, so the cache is
small and hit after the first call at each level (and persists across
processes via the JAX compilation cache).

Keys are uploaded once per (keys object, level) and reused.

reference parity: evaluator.h op surface; no reference analogue for the
execution model (the reference is single-threaded eager C++).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..ciphertext import Ciphertext, Plaintext
from ..context import SealContext
from ..evaluator import Evaluator
from ..keys import GaloisKeys, RelinKeys
from ..ops.dyadic import add_poly, dyadic_product, negate_poly, sub_poly
from ..ops.keyswitch import (
    KeySwitchPlan,
    compute_modup_digits,
    keyswitch_inner_product,
    switch_key,
)
from ..ops.rnsops import divide_and_round_q_last, divide_and_round_q_last_ntt
from ..params import SchemeType

__all__ = ["DeviceEvaluator"]


class DeviceEvaluator:
    def __init__(self, context: SealContext):
        import jax

        self._jax = jax
        self.context = context
        self.host = Evaluator(context)  # metadata/validation logic + fallback
        self._jit_cache: Dict[tuple, object] = {}
        self._plan_cache: Dict[tuple, KeySwitchPlan] = {}
        self._key_cache: Dict[tuple, object] = {}

    # -- infrastructure ----------------------------------------------------
    def put(self, ct: Ciphertext) -> Ciphertext:
        """Upload a ciphertext's data to the device."""
        return Ciphertext(
            self._jax.device_put(np.asarray(ct.data)),
            ct.parms_id, ct.is_ntt_form, ct.scale,
        )

    def get(self, ct: Ciphertext) -> Ciphertext:
        """Pull a ciphertext's data back to host numpy."""
        return Ciphertext(
            np.asarray(ct.data), ct.parms_id, ct.is_ntt_form, ct.scale
        )

    def _cd(self, ct: Ciphertext):
        cd = self.context.get_context_data(ct.parms_id)
        if cd is None:
            raise ValueError("ciphertext is not valid for encryption parameters")
        return cd

    def _jit(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jax.jit(builder())
            self._jit_cache[key] = fn
        return fn

    def _plan(self, parms_id) -> KeySwitchPlan:
        k = tuple(parms_id)
        plan = self._plan_cache.get(k)
        if plan is None:
            plan = KeySwitchPlan(self.context, parms_id)
            self._plan_cache[k] = plan
        return plan

    def _key_data(self, keys, index) -> object:
        """Stacked [n_bundles, 2, L_key, N] key tensor, uploaded once.

        The cache entry holds a reference to the keys object so a
        garbage-collected id() can never alias another object's entry."""
        k = (id(keys), index)
        hit = self._key_cache.get(k)
        if hit is not None and hit[0] is keys:
            return hit[1]
        vec = keys.key(index)
        data = self._jax.device_put(
            np.stack([np.asarray(pk.data.data) for pk in vec])
        )
        self._key_cache[k] = (keys, data)
        return data

    # -- linear ops ---------------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self.host._check_same(a, b)
        if a.size != b.size:
            return self.put(self.host.add(self.get(a), self.get(b)))
        cd = self._cd(a)
        limbs = cd.limb_constants
        fn = self._jit(("add", a.parms_id, a.size),
                       lambda: lambda x, y: add_poly(x, y, limbs))
        return Ciphertext(fn(a.data, b.data), a.parms_id, a.is_ntt_form, a.scale)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self.host._check_same(a, b)
        if a.size != b.size:
            return self.put(self.host.sub(self.get(a), self.get(b)))
        cd = self._cd(a)
        limbs = cd.limb_constants
        fn = self._jit(("sub", a.parms_id, a.size),
                       lambda: lambda x, y: sub_poly(x, y, limbs))
        return Ciphertext(fn(a.data, b.data), a.parms_id, a.is_ntt_form, a.scale)

    def negate(self, a: Ciphertext) -> Ciphertext:
        cd = self._cd(a)
        limbs = cd.limb_constants
        fn = self._jit(("neg", a.parms_id, a.size),
                       lambda: lambda x: negate_poly(x, limbs))
        return Ciphertext(fn(a.data), a.parms_id, a.is_ntt_form, a.scale)

    # -- multiplication -----------------------------------------------------
    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        cd = self._cd(a)
        scheme = cd.parms.scheme
        # host-plane metadata validation runs on every call (the traced
        # executable only re-runs per shape, so checks must live out here)
        self.host._check_same(a, b)
        if scheme == SchemeType.CKKS:
            self.host._check_scale_bounds(a.scale * b.scale, cd)
        if scheme == SchemeType.CKKS and a.size == 2 and b.size == 2:
            limbs = cd.limb_constants

            def build():
                import jax.numpy as jnp

                def fn(x, y):
                    x0, x1 = x[..., 0, :, :], x[..., 1, :, :]
                    y0, y1 = y[..., 0, :, :], y[..., 1, :, :]
                    c0 = dyadic_product(x0, y0, limbs)
                    c1 = add_poly(dyadic_product(x0, y1, limbs),
                                  dyadic_product(x1, y0, limbs), limbs)
                    c2 = dyadic_product(x1, y1, limbs)
                    return jnp.stack([c0, c1, c2], axis=-3)

                return fn

            f = self._jit(("ckks_mul", a.parms_id), build)
            new_scale = a.scale * b.scale
            return Ciphertext(f(a.data, b.data), a.parms_id, True, new_scale)
        # BFV (BEHZ) and odd sizes: run the host evaluator's exact logic
        # traced under jit once per shape signature.
        host = self.host
        key = ("mul_generic", a.parms_id, a.size, b.size, a.is_ntt_form)

        def build():
            def fn(x, y):
                ca = Ciphertext(x, a.parms_id, a.is_ntt_form, a.scale)
                cb = Ciphertext(y, b.parms_id, b.is_ntt_form, b.scale)
                return host.multiply(ca, cb).data

            return fn

        f = self._jit(key, build)
        out = f(a.data, b.data)
        new_scale = a.scale * b.scale if cd.parms.scheme == SchemeType.CKKS else a.scale
        return Ciphertext(out, a.parms_id, a.is_ntt_form, new_scale)

    def square(self, a: Ciphertext) -> Ciphertext:
        """Dedicated square: 3-product convolution, and for BFV one base
        extension instead of two (reference: evaluator.cpp:560-770);
        bit-exact with multiply(a, a)."""
        if a.size != 2:
            return self.multiply(a, a)
        cd = self._cd(a)
        scheme = cd.parms.scheme
        if scheme == SchemeType.CKKS:
            if not a.is_ntt_form:
                raise ValueError("CKKS square operand must be in NTT form")
            self.host._check_scale_bounds(a.scale * a.scale, cd)
            limbs = cd.limb_constants

            def build():
                import jax.numpy as jnp

                from .pipelines import _square3

                def fn(x):
                    return jnp.stack(_square3(x, limbs), axis=-3)

                return fn

            f = self._jit(("ckks_square", a.parms_id), build)
            return Ciphertext(f(a.data), a.parms_id, True, a.scale * a.scale)
        # BFV: trace the host's dedicated BEHZ square once per shape
        host = self.host
        key = ("bfv_square", a.parms_id, a.is_ntt_form)

        def build():
            def fn(x):
                ca = Ciphertext(x, a.parms_id, a.is_ntt_form, a.scale)
                return host.square(ca).data

            return fn

        f = self._jit(key, build)
        return Ciphertext(f(a.data), a.parms_id, a.is_ntt_form, a.scale)

    # -- key switching --------------------------------------------------
    def relinearize(self, a: Ciphertext, relin_keys: RelinKeys) -> Ciphertext:
        if a.size != 3:
            return self.put(self.host.relinearize(self.get(a), relin_keys))
        plan = self._plan(a.parms_id)
        cd = self._cd(a)
        limbs = cd.limb_constants
        is_ntt = a.is_ntt_form

        def build():
            import jax.numpy as jnp

            def fn(x, kdata):
                d0, d1 = switch_key(x[..., 2, :, :], kdata, plan, is_ntt)
                c0 = add_poly(x[..., 0, :, :], d0, limbs)
                c1 = add_poly(x[..., 1, :, :], d1, limbs)
                return jnp.stack([c0, c1], axis=-3)

            return fn

        f = self._jit(("relin", a.parms_id, is_ntt), build)
        kdata = self._key_data(relin_keys, 2)
        return Ciphertext(f(a.data, kdata), a.parms_id, is_ntt, a.scale)

    def _check_galois(self, a: Ciphertext, galois_keys: GaloisKeys, elts):
        """Host-plane eager validations mirroring Evaluator.apply_galois
        (a size-3 ciphertext's c2 would otherwise be silently dropped)."""
        if galois_keys.parms_id != self.context.key_parms_id:
            raise ValueError("galois_keys is not valid for encryption parameters")
        if a.size > 2:
            raise ValueError("encrypted size must be 2")
        for elt in elts:
            if not galois_keys.has_key(elt):
                raise ValueError("Galois key not present")

    def apply_galois(self, a: Ciphertext, galois_elt: int,
                     galois_keys: GaloisKeys) -> Ciphertext:
        self._check_galois(a, galois_keys, (galois_elt,))
        cd = self._cd(a)
        plan = self._plan(a.parms_id)
        tool = cd.galois_tool
        limbs = cd.limb_constants
        is_ntt = a.is_ntt_form

        def build():
            import jax.numpy as jnp

            def fn(x, kdata):
                if is_ntt:
                    c0 = tool.apply_galois_ntt(x[..., 0, :, :], galois_elt)
                    c1 = tool.apply_galois_ntt(x[..., 1, :, :], galois_elt)
                else:
                    c0 = tool.apply_galois(x[..., 0, :, :], galois_elt, limbs)
                    c1 = tool.apply_galois(x[..., 1, :, :], galois_elt, limbs)
                d0, d1 = switch_key(c1, kdata, plan, is_ntt)
                return jnp.stack([add_poly(c0, d0, limbs), d1], axis=-3)

            return fn

        f = self._jit(("galois", a.parms_id, galois_elt, is_ntt), build)
        kdata = self._key_data(galois_keys, galois_elt)
        return Ciphertext(f(a.data, kdata), a.parms_id, is_ntt, a.scale)

    def rotate_vector(self, a, steps, galois_keys):
        """Direct key when present, else the reference's NAF fallback
        (evaluator.cpp:1945-1999) — a single-term NAF with a missing key
        raises instead of recursing."""
        if steps == 0:
            return a
        cd = self._cd(a)
        tool = cd.galois_tool
        elt = tool.get_elt_from_step(steps)
        if galois_keys.has_key(elt):
            return self.apply_galois(a, elt, galois_keys)
        from ..utils.numth import naf

        terms = naf(steps)
        if len(terms) == 1:
            raise ValueError("Galois key not present")
        out = a
        for term in sorted(terms, key=abs, reverse=True):
            if abs(term) != (cd.parms.poly_modulus_degree >> 1):
                out = self.rotate_vector(out, term, galois_keys)
        return out

    rotate_rows = rotate_vector

    def complex_conjugate(self, a, galois_keys):
        n = self._cd(a).parms.poly_modulus_degree
        return self.apply_galois(a, 2 * n - 1, galois_keys)

    def rotate_vector_many(self, a: Ciphertext, steps: Sequence[int],
                           galois_keys: GaloisKeys) -> List[Ciphertext]:
        """Hoisted: one mod-up for all rotations, one jitted program."""
        cd = self._cd(a)
        plan = self._plan(a.parms_id)
        tool = cd.galois_tool
        limbs = cd.limb_constants
        is_ntt = a.is_ntt_form
        elts = tuple(tool.get_elt_from_step(s) for s in steps)
        self._check_galois(a, galois_keys, elts)

        def build():
            import jax.numpy as jnp

            def fn(x, kstack):
                c0 = x[..., 0, :, :]
                c1 = x[..., 1, :, :]
                ct_k = compute_modup_digits(c1, plan, is_ntt)
                outs = []
                for i, elt in enumerate(elts):
                    ct_k_rot = tool.apply_galois_ntt(ct_k, elt)
                    d0, d1 = keyswitch_inner_product(ct_k_rot, kstack[i], plan, is_ntt)
                    p0 = (tool.apply_galois_ntt(c0, elt) if is_ntt
                          else tool.apply_galois(c0, elt, limbs))
                    outs.append(jnp.stack([add_poly(p0, d0, limbs), d1], axis=-3))
                return jnp.stack(outs)

            return fn

        f = self._jit(("rot_many", a.parms_id, elts, is_ntt), build)
        kstack_key = (id(galois_keys), elts)
        hit = self._key_cache.get(kstack_key)
        if hit is not None and hit[0] is galois_keys:
            kstack = hit[1]
        else:
            kstack = self._jax.device_put(np.stack([
                np.stack([np.asarray(pk.data.data) for pk in galois_keys.key(e)])
                for e in elts
            ]))
            self._key_cache[kstack_key] = (galois_keys, kstack)
        out = f(a.data, kstack)
        return [
            Ciphertext(out[i], a.parms_id, is_ntt, a.scale)
            for i in range(len(elts))
        ]

    def multiply_relin_rescale(self, a: Ciphertext, b: Ciphertext,
                               relin_keys: RelinKeys,
                               fused: bool = True) -> Ciphertext:
        """Production one-call hot op: multiply + relinearize + rescale as
        a single compiled program (optionally with the fused P*q_last
        mod-down — decrypts equal, one NTT round trip cheaper)."""
        cd = self._cd(a)
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("multiply_relin_rescale is a CKKS op")
        if a.size != 2 or b.size != 2:
            raise ValueError("operands must be size-2 ciphertexts")
        if not (a.is_ntt_form and b.is_ntt_form):
            raise ValueError("CKKS operands must be in NTT form")
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        self.host._check_same(a, b)
        self.host._check_scale_bounds(a.scale * b.scale, cd)
        return self._mrr_run(a, (a.data, b.data), relin_keys, fused, False,
                             a.scale * b.scale)

    def square_relin_rescale(self, a: Ciphertext, relin_keys: RelinKeys,
                             fused: bool = True) -> Ciphertext:
        """One-call fused square + relinearize + rescale (3-product
        convolution; bit-exact with multiply_relin_rescale(a, a))."""
        cd = self._cd(a)
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("square_relin_rescale is a CKKS op")
        if a.size != 2:
            raise ValueError("operand must be a size-2 ciphertext")
        if not a.is_ntt_form:
            raise ValueError("CKKS operand must be in NTT form")
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        self.host._check_scale_bounds(a.scale * a.scale, cd)
        return self._mrr_run(a, (a.data,), relin_keys, fused, True,
                             a.scale * a.scale)

    def _mrr_run(self, a: Ciphertext, args, relin_keys, fused: bool,
                 square: bool, prod_scale: float) -> Ciphertext:
        from .pipelines import build_ckks_mul_relin_rescale

        cd = self._cd(a)
        key = ("mrr", a.parms_id, fused, square)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jax.jit(
                build_ckks_mul_relin_rescale(
                    self.context, a.parms_id, fused=fused, square=square
                )
            )
            self._jit_cache[key] = fn
        kdata = self._key_data(relin_keys, 2)
        nxt = cd.next_context_data
        q_last = cd.parms.coeff_modulus[-1].value
        return Ciphertext(
            fn(*args, kdata), nxt.parms_id, True, prod_scale / q_last
        )

    # -- level movement ---------------------------------------------------
    def rescale_to_next(self, a: Ciphertext) -> Ciphertext:
        cd = self._cd(a)
        if cd.parms.scheme != SchemeType.CKKS or not a.is_ntt_form:
            return self.put(self.host.rescale_to_next(self.get(a)))
        nxt = cd.next_context_data
        if nxt is None:
            raise ValueError("end of modulus switching chain reached")
        tool = cd.device_rns_tool
        tables = cd.ntt_tables
        fn = self._jit(("rescale", a.parms_id, a.size),
                       lambda: lambda x: divide_and_round_q_last_ntt(x, tool, tables))
        q_last = cd.parms.coeff_modulus[-1].value
        return Ciphertext(fn(a.data), nxt.parms_id, True, a.scale / q_last)

    def mod_switch_to_next(self, a: Ciphertext) -> Ciphertext:
        cd = self._cd(a)
        nxt = cd.next_context_data
        if nxt is None:
            raise ValueError("end of modulus switching chain reached")
        if cd.parms.scheme == SchemeType.CKKS:
            # drop the last limb (no scaling)
            L = len(nxt.parms.coeff_modulus)
            fn = self._jit(("drop", a.parms_id, a.size),
                           lambda: lambda x: x[..., :L, :])
            return Ciphertext(fn(a.data), nxt.parms_id, a.is_ntt_form, a.scale)
        tool = cd.device_rns_tool
        fn = self._jit(("bfv_drop", a.parms_id, a.size),
                       lambda: lambda x: divide_and_round_q_last(x, tool))
        return Ciphertext(fn(a.data), nxt.parms_id, a.is_ntt_form, a.scale)

    def mod_switch_to(self, a: Ciphertext, parms_id) -> Ciphertext:
        """Chain of jit-cached per-level drops down to parms_id
        (evaluator.h mod_switch_to)."""
        cd = self._cd(a)
        target = self.context.get_context_data(parms_id)
        if target is None:
            raise ValueError("parms_id is not valid")
        if cd.chain_index < target.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        out = a
        while out.parms_id != tuple(parms_id):
            out = self.mod_switch_to_next(out)
        return out

    def rescale_to(self, a: Ciphertext, parms_id) -> Ciphertext:
        cd = self._cd(a)
        target = self.context.get_context_data(parms_id)
        if target is None or cd.chain_index < target.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        out = a
        while out.parms_id != tuple(parms_id):
            out = self.rescale_to_next(out)
        return out

    # -- NTT transforms -----------------------------------------------------
    def transform_to_ntt(self, a: Ciphertext) -> Ciphertext:
        if a.is_ntt_form:
            raise ValueError("encrypted is already in NTT form")
        cd = self._cd(a)
        tables = cd.ntt_tables
        from ..ops.ntt import ntt_forward

        fn = self._jit(("to_ntt", a.parms_id, a.size),
                       lambda: lambda x: ntt_forward(x, tables))
        return Ciphertext(fn(a.data), a.parms_id, True, a.scale)

    def transform_from_ntt(self, a: Ciphertext) -> Ciphertext:
        if not a.is_ntt_form:
            raise ValueError("encrypted is not in NTT form")
        cd = self._cd(a)
        tables = cd.ntt_tables
        from ..ops.ntt import ntt_inverse

        fn = self._jit(("from_ntt", a.parms_id, a.size),
                       lambda: lambda x: ntt_inverse(x, tables))
        return Ciphertext(fn(a.data), a.parms_id, False, a.scale)

    # -- composite ops ------------------------------------------------------
    def add_many(self, encrypteds: Sequence[Ciphertext]) -> Ciphertext:
        """One fused program summing k same-shape ciphertexts."""
        if not encrypteds:
            raise ValueError("encrypteds cannot be empty")
        a = encrypteds[0]
        if len(encrypteds) == 1:
            return a
        if any(c.size != a.size for c in encrypteds):
            return self.put(self.host.add_many([self.get(c) for c in encrypteds]))
        for c in encrypteds[1:]:
            self.host._check_same(a, c)
        cd = self._cd(a)
        limbs = cd.limb_constants

        def build():
            def fn(*xs):
                acc = xs[0]
                for x in xs[1:]:
                    acc = add_poly(acc, x, limbs)
                return acc

            return fn

        f = self._jit(("add_many", a.parms_id, a.size, len(encrypteds)), build)
        return Ciphertext(f(*[c.data for c in encrypteds]),
                          a.parms_id, a.is_ntt_form, a.scale)

    def multiply_many(self, encrypteds: Sequence[Ciphertext],
                      relin_keys: RelinKeys) -> Ciphertext:
        """Balanced product tree over jit-cached multiply/relinearize
        (evaluator.h multiply_many; BFV only, like the reference).  Shares
        the host's product_tree so the pairing order — and hence the
        result — is bit-identical across planes."""
        from ..evaluator import product_tree

        if not encrypteds:
            raise ValueError("encrypteds cannot be empty")
        if self._cd(encrypteds[0]).parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        return product_tree(
            encrypteds, self.multiply, self.square,
            lambda ct: self.relinearize(ct, relin_keys),
        )

    def exponentiate(self, a: Ciphertext, exponent: int,
                     relin_keys: RelinKeys) -> Ciphertext:
        """Balanced product tree like the host/reference (bit-identical
        results); identical-operand pairs ride the square fast path."""
        if exponent == 0:
            raise ValueError("exponent cannot be 0")
        if exponent == 1:
            return a
        return self.multiply_many([a] * exponent, relin_keys)

    # -- BFV batching rotations / CKKS conjugate ---------------------------
    def rotate_columns(self, a: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        if self._cd(a).parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        n = self._cd(a).parms.poly_modulus_degree
        return self.apply_galois(a, 2 * n - 1, galois_keys)

    def rotate_rows_many(self, a: Ciphertext, steps: Sequence[int],
                         galois_keys: GaloisKeys) -> List[Ciphertext]:
        if self._cd(a).parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        return self.rotate_vector_many(a, steps, galois_keys)

    # -- plaintext ops ------------------------------------------------------
    def _check_plain_ntt(self, a: Ciphertext, plain: Plaintext):
        """Host-plane validations for the CKKS-NTT plain fast paths,
        mirroring Evaluator.add_plain/sub_plain."""
        from ..evaluator import _same_scale

        if a.parms_id != plain.parms_id:
            raise ValueError("encrypted and plain parameter mismatch")
        if not _same_scale(a.scale, plain.scale):
            raise ValueError("scale mismatch")

    def add_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        cd = self._cd(a)
        if cd.parms.scheme == SchemeType.CKKS and a.is_ntt_form and plain.is_ntt_form:
            self._check_plain_ntt(a, plain)
            limbs = cd.limb_constants
            pdata = np.asarray(plain.data)

            def build():
                def fn(x, p):
                    c0 = add_poly(x[..., 0, :, :], p, limbs)
                    return self._jax.numpy.concatenate(
                        [c0[..., None, :, :], x[..., 1:, :, :]], axis=-3
                    )

                return fn

            f = self._jit(("add_plain_ntt", a.parms_id, a.size), build)
            return Ciphertext(f(a.data, pdata), a.parms_id, True, a.scale)
        return self.put(self.host.add_plain(self.get(a), plain))

    def sub_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        cd = self._cd(a)
        if cd.parms.scheme == SchemeType.CKKS and a.is_ntt_form and plain.is_ntt_form:
            self._check_plain_ntt(a, plain)
            limbs = cd.limb_constants
            pdata = np.asarray(plain.data)

            def build():
                def fn(x, p):
                    c0 = sub_poly(x[..., 0, :, :], p, limbs)
                    return self._jax.numpy.concatenate(
                        [c0[..., None, :, :], x[..., 1:, :, :]], axis=-3
                    )

                return fn

            f = self._jit(("sub_plain_ntt", a.parms_id, a.size), build)
            return Ciphertext(f(a.data, pdata), a.parms_id, True, a.scale)
        return self.put(self.host.sub_plain(self.get(a), plain))

    def multiply_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        cd = self._cd(a)
        if a.is_ntt_form and plain.is_ntt_form:
            if a.parms_id != plain.parms_id:
                raise ValueError("encrypted_ntt and plain_ntt parameter mismatch")
            self.host._check_scale_bounds(a.scale * plain.scale, cd)
            limbs = cd.limb_constants
            pdata = np.asarray(plain.data)
            fn = self._jit(("mul_plain_ntt", a.parms_id, a.size),
                           lambda: lambda x, p: dyadic_product(x, p, limbs))
            return Ciphertext(
                fn(a.data, pdata), a.parms_id, True, a.scale * plain.scale
            )
        return self.put(self.host.multiply_plain(self.get(a), plain))
