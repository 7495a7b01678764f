"""KeyGenerator (reference: native/src/seal/keygenerator.{h,cpp}).

Secret key: ternary poly in NTT form at the key level.  Public key:
symmetric zero-encryption.  Relinearization and Galois keys use the fork's
bundle-wise hybrid key-switching keygen (keygenerator.cpp:325-369):
decomp_mod_count = ceil(n_ct_rns / n_sp_rns) bundles, bundle b encrypting
P * s'|_{bundle b} where P = prod of the special primes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .ciphertext import Ciphertext
from .context import SealContext
from .keys import GaloisKeys, KSwitchKeys, PublicKey, RelinKeys, SecretKey
from .modulus import CIPHERTEXT_SIZE_MAX
from .ops import modops
from .ops.backend import set_at
from .ops.dyadic import add_poly, dyadic_product, multiply_poly_scalar
from .ops.ntt import ntt_forward
from .rlwe import encrypt_zero_symmetric, parms_rng
from .utils.prng import sample_poly_ternary

__all__ = ["KeyGenerator"]


class KeyGenerator:
    def __init__(self, context: SealContext, secret_key: Optional[SecretKey] = None):
        if not context.parameters_set():
            raise ValueError("encryption parameters are not set correctly")
        self.context = context
        cd = context.key_context_data()
        parms = cd.parms

        if secret_key is not None:
            self._secret_key = secret_key
        else:
            moduli = [m.value for m in parms.coeff_modulus]
            n = parms.poly_modulus_degree
            rng = parms_rng(parms)
            sk = np.asarray(sample_poly_ternary(rng, moduli, n))
            sk_ntt = ntt_forward(sk, cd.ntt_tables)
            self._secret_key = SecretKey(data=sk_ntt, parms_id=cd.parms_id)

        # powers-of-s cache (keygenerator.cpp:256-323): [power, L_key, N]
        self._sk_powers = [self._secret_key.data]
        self._public_key: Optional[PublicKey] = None

    @property
    def secret_key(self) -> SecretKey:
        return self._secret_key

    def public_key(self) -> PublicKey:
        if self._public_key is None:
            cd = self.context.key_context_data()
            ct = encrypt_zero_symmetric(
                self._secret_key, self.context, cd.parms_id, is_ntt_form=True
            )
            self._public_key = PublicKey(data=ct, parms_id=cd.parms_id)
        return self._public_key

    def _compute_sk_powers(self, max_power: int):
        cd = self.context.key_context_data()
        limbs = cd.limb_constants
        while len(self._sk_powers) < max_power:
            self._sk_powers.append(
                dyadic_product(self._sk_powers[-1], self._sk_powers[0], limbs)
            )

    def sk_power(self, power: int):
        """NTT-form s^power at the key level."""
        self._compute_sk_powers(power)
        return self._sk_powers[power - 1]

    def _fresh_key_seed(self) -> tuple:
        """c1 seed for seeded (Serializable) key-switch keys: fresh entropy,
        or a context-global deterministic derivation when the parameter seed
        is pinned (mirrors Encryptor._fresh_c1_seed; pinned seeds are
        test-only)."""
        from .utils.prng import random_seed

        pinned = self.context.key_context_data().parms.random_seed
        if pinned is not None:
            c = getattr(self.context, "_seeded_c1_counter", 0) + 1
            self.context._seeded_c1_counter = c
            return tuple((s ^ 0x3C3C3C3C3C3C3C3C ^ c) & 0xFFFFFFFFFFFFFFFF
                         for s in pinned)
        return random_seed()

    # -- hybrid key-switching keygen (fork) ------------------------------
    def _generate_one_kswitch_key(self, new_key,
                                  seeds: Optional[list] = None) -> List[PublicKey]:
        """Bundle-wise keys for switching from `new_key` (NTT form,
        [n_ct_rns(+), N]) back to the secret key
        (reference: keygenerator.cpp:325-369).

        When `seeds` is a list, each bundle ciphertext's c1 is drawn from a
        fresh published seed (appended to the list) — the seeded dataflow of
        Serializable<RelinKeys>/<GaloisKeys> (keygenerator.h, seed flow
        rlwe.cpp:295-301), halving key wire size."""
        ctx = self.context
        if not ctx.using_keyswitching:
            raise RuntimeError("keyswitching is not supported by the context")
        key_cd = ctx.key_context_data()
        key_modulus = key_cd.parms.coeff_modulus
        first_parms = ctx.first_context_data().parms
        n_ct_rns = len(first_parms.coeff_modulus)
        n_sp_rns = first_parms.n_special_primes
        decomp_mod_count = (n_ct_rns + n_sp_rns - 1) // n_sp_rns
        limbs = key_cd.limb_constants

        # factor[rns] = prod of special primes mod q_rns
        factors = np.zeros(n_ct_rns, dtype=np.uint64)
        for rns in range(n_ct_rns):
            f = 1
            for k in range(n_sp_rns):
                f = (f * key_modulus[n_ct_rns + k].value) % key_modulus[rns].value
            factors[rns] = f

        out: List[PublicKey] = []
        for b in range(decomp_mod_count):
            c1_seed = None
            if seeds is not None:
                c1_seed = self._fresh_key_seed()
                seeds.append(c1_seed)
            ct = encrypt_zero_symmetric(
                self._secret_key, ctx, key_cd.parms_id, is_ntt_form=True,
                c1_seed=c1_seed,
            )
            rns0 = b * n_sp_rns
            rns1 = min(rns0 + n_sp_rns, n_ct_rns)
            # c0[rns] += new_key[rns] * P mod q_rns for the bundle's limbs
            sel = np.arange(rns0, rns1)
            fac = factors[sel].reshape(-1, 1)
            p_sel = limbs.p[sel]
            r0_sel = limbs.ratio0[sel]
            r1_sel = limbs.ratio1[sel]
            add_term = modops.mul_mod(new_key[sel, :], fac, p_sel, r0_sel, r1_sel)
            c0_sel = modops.add_mod(ct.data[0, sel, :], add_term, p_sel)
            data = set_at(ct.data, (0, sel, slice(None)), c0_sel)
            ct = Ciphertext(data, ct.parms_id, ct.is_ntt_form, ct.scale)
            out.append(PublicKey(data=ct, parms_id=key_cd.parms_id))
        return out

    def _relin_keys_impl(self, count: int, collect_seeds: bool):
        """Shared body of relin_keys / relin_keys_serializable
        (reference: keygenerator.cpp:138-178)."""
        if not 1 <= count <= CIPHERTEXT_SIZE_MAX - 2:
            raise ValueError("invalid count")
        self._compute_sk_powers(count + 1)
        rk = RelinKeys()
        rk.keys = []
        seed_rows = []
        for p in range(1, count + 1):
            seeds: Optional[list] = [] if collect_seeds else None
            rk.keys.append(
                self._generate_one_kswitch_key(self._sk_powers[p], seeds=seeds)
            )
            seed_rows.append(seeds)
        rk.parms_id = self.context.key_parms_id
        return rk, seed_rows

    def relin_keys(self, count: int = 1) -> RelinKeys:
        """Keys for re-linearizing s^2 .. s^(count+1)."""
        return self._relin_keys_impl(count, collect_seeds=False)[0]

    def relin_keys_serializable(self, count: int = 1):
        """Seed-compressed relinearization keys: serialize at roughly half
        size (c0 + 64-byte c1 seed per bundle ciphertext; reference:
        KeyGenerator::relin_keys returning Serializable<RelinKeys>,
        keygenerator.h:96-118).  The wrapped .obj is a fully expanded
        RelinKeys, usable directly."""
        from .serialization import SerializableKSwitchKeys

        rk, seed_rows = self._relin_keys_impl(count, collect_seeds=True)
        return SerializableKSwitchKeys(rk, seed_rows)

    def _galois_keys_impl(self, galois_elts, collect_seeds: bool):
        """Shared body of galois_keys / galois_keys_serializable
        (reference: keygenerator.cpp:180-245)."""
        ctx = self.context
        key_cd = ctx.key_context_data()
        galois_tool = key_cd.galois_tool
        if galois_elts is None:
            galois_elts = galois_tool.get_elts_all()
        n = key_cd.parms.poly_modulus_degree

        gk = GaloisKeys()
        max_index = max(GaloisKeys.get_index(e) for e in galois_elts)
        gk.keys = [[] for _ in range(max_index + 1)]
        seed_rows = [[] for _ in range(max_index + 1)]
        for elt in galois_elts:
            if elt % 2 == 0 or elt >= 2 * n:
                raise ValueError("Galois element is not valid")
            idx = GaloisKeys.get_index(elt)
            if gk.keys[idx]:
                continue
            # rotated secret key: apply automorphism in NTT domain
            rotated = galois_tool.apply_galois_ntt(self._secret_key.data, elt)
            seeds: Optional[list] = [] if collect_seeds else None
            gk.keys[idx] = self._generate_one_kswitch_key(rotated, seeds=seeds)
            seed_rows[idx] = seeds
        gk.parms_id = ctx.key_parms_id
        return gk, seed_rows

    def galois_keys(self, galois_elts: Optional[Sequence[int]] = None) -> GaloisKeys:
        """Keys for the Galois automorphisms x -> x^elt."""
        return self._galois_keys_impl(galois_elts, collect_seeds=False)[0]

    def galois_keys_serializable(self, galois_elts: Optional[Sequence[int]] = None):
        """Seed-compressed Galois keys (reference: KeyGenerator::galois_keys
        returning Serializable<GaloisKeys>, keygenerator.h:131-178) — the
        largest objects shipped to a serving accelerator, halved on the
        wire."""
        from .serialization import SerializableKSwitchKeys

        gk, seed_rows = self._galois_keys_impl(galois_elts, collect_seeds=True)
        return SerializableKSwitchKeys(gk, seed_rows)

    def galois_keys_from_steps(self, steps: Sequence[int]) -> GaloisKeys:
        """Keys for a list of rotation steps (reference:
        KeyGenerator::galois_keys(const vector<int>&))."""
        tool = self.context.key_context_data().galois_tool
        return self.galois_keys(tool.get_elts_from_steps(list(steps)))
