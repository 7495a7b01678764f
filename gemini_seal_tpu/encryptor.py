"""Encryptor (reference: native/src/seal/encryptor.{h,cpp}).

BFV: zero-encryption at the target level + exact Delta*m rounding fix into
c0 (scalingvariant).  CKKS: zero-encryption in NTT form at the plaintext's
level + NTT-domain plaintext addition.  Zero-encryptions below the first
level mod-switch down from the previous level (encryptor.cpp:144-173).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ciphertext import Ciphertext, Plaintext
from .context import SealContext
from .keys import PublicKey, SecretKey
from .ops.backend import set_at
from .ops.dyadic import add_poly
from .ops.ntt import ntt_forward, ntt_inverse
from .ops.rnsops import (
    divide_and_round_q_last,
    divide_and_round_q_last_ntt,
    multiply_add_plain_with_scaling_variant,
)
from .params import SchemeType
from .rlwe import encrypt_zero_asymmetric, encrypt_zero_symmetric

__all__ = ["Encryptor"]


class Encryptor:
    def __init__(
        self,
        context: SealContext,
        public_key: Optional[PublicKey] = None,
        secret_key: Optional[SecretKey] = None,
    ):
        if not context.parameters_set():
            raise ValueError("encryption parameters are not set correctly")
        if public_key is None and secret_key is None:
            raise ValueError("need a public or secret key")
        self.context = context
        self.public_key = public_key
        self.secret_key = secret_key

    # -- public API -------------------------------------------------------
    def encrypt(self, plain: Plaintext) -> Ciphertext:
        return self._encrypt_internal(plain, is_asymmetric=True)

    def encrypt_symmetric(self, plain: Plaintext) -> Ciphertext:
        return self._encrypt_internal(plain, is_asymmetric=False)

    def encrypt_zero(self, parms_id=None, is_asymmetric: bool = True) -> Ciphertext:
        if parms_id is None:
            parms_id = self.context.first_parms_id
        return self._encrypt_zero_internal(parms_id, is_asymmetric)

    def encrypt_zero_symmetric(self, parms_id=None) -> Ciphertext:
        return self.encrypt_zero(parms_id, is_asymmetric=False)

    def _fresh_c1_seed(self) -> tuple:
        """c1 seed for seeded encryption: fresh entropy, or (matching every
        other sampling path) a deterministic derivation when the parameter
        seed is pinned for reproducibility.

        The pinned-seed counter is CONTEXT-global, not per-Encryptor: two
        Encryptor instances over the same pinned context draw distinct c1
        streams, so the nonce-reuse pattern (identical c1 across different
        messages leaking plaintext differences via c0 - c0' = Delta(m1 - m2)
        + e - e') cannot occur within a process.  Pinned seeds remain
        test-only; distinct processes sharing one pinned seed still collide —
        never pin parms.random_seed in production.
        """
        from .utils.prng import random_seed

        pinned = self.context.key_context_data().parms.random_seed
        if pinned is not None:
            c = getattr(self.context, "_seeded_c1_counter", 0) + 1
            self.context._seeded_c1_counter = c
            return tuple((s ^ 0x5A5A5A5A5A5A5A5A ^ c) & 0xFFFFFFFFFFFFFFFF
                         for s in pinned)
        return random_seed()

    # -- seeded (Serializable<Ciphertext>) variants -----------------------
    def encrypt_symmetric_serializable(self, plain: Plaintext):
        """Seed-compressed symmetric encryption: the returned wrapper
        serializes at half size (c0 + the c1 seed — reference:
        Encryptor::encrypt_symmetric returning Serializable<Ciphertext>,
        seed flow rlwe.cpp:295-301)."""
        from .serialization import SerializableCiphertext

        seed = self._fresh_c1_seed()
        ct = self._encrypt_internal(plain, is_asymmetric=False, c1_seed=seed)
        return SerializableCiphertext(ct, seed)

    def encrypt_zero_symmetric_serializable(self, parms_id=None):
        from .serialization import SerializableCiphertext

        if parms_id is None:
            parms_id = self.context.first_parms_id
        seed = self._fresh_c1_seed()
        ct = self._encrypt_zero_internal(parms_id, False, c1_seed=seed)
        return SerializableCiphertext(ct, seed)

    # -- internals --------------------------------------------------------
    def _encrypt_zero_internal(self, parms_id, is_asymmetric: bool, c1_seed=None) -> Ciphertext:
        ctx = self.context
        context_data = ctx.get_context_data(parms_id)
        if context_data is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        scheme = context_data.parms.scheme
        is_ntt_form = scheme == SchemeType.CKKS

        if is_asymmetric:
            if self.public_key is None:
                raise ValueError("public key is not set")
            prev = context_data.prev_context_data
            if prev is not None:
                # encrypt at the previous level, then mod-switch down one
                # step (encryptor.cpp:144-173)
                temp = encrypt_zero_asymmetric(
                    self.public_key, ctx, prev.parms_id, is_ntt_form
                )
                tool = prev.device_rns_tool
                if is_ntt_form:
                    new_data = divide_and_round_q_last_ntt(
                        temp.data, tool, prev.ntt_tables
                    )
                else:
                    new_data = divide_and_round_q_last(temp.data, tool)
                return Ciphertext(
                    data=new_data,
                    parms_id=context_data.parms_id,
                    is_ntt_form=is_ntt_form,
                    scale=temp.scale,
                )
            return encrypt_zero_asymmetric(self.public_key, ctx, parms_id, is_ntt_form)
        if self.secret_key is None:
            raise ValueError("secret key is not set")
        return encrypt_zero_symmetric(
            self.secret_key, ctx, parms_id, is_ntt_form, c1_seed=c1_seed
        )

    def _encrypt_internal(self, plain: Plaintext, is_asymmetric: bool, c1_seed=None) -> Ciphertext:
        scheme = self.context.key_context_data().parms.scheme
        if scheme == SchemeType.BFV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            ct = self._encrypt_zero_internal(
                self.context.first_parms_id, is_asymmetric, c1_seed=c1_seed
            )
            # c0 += round(q/t * m) (scalingvariant.cpp:15-52)
            context_data = self.context.first_context_data()
            n = context_data.parms.poly_modulus_degree
            m = np.zeros(n, dtype=np.uint64)
            pdata = np.asarray(plain.data)
            m[: pdata.shape[0]] = pdata
            c0 = multiply_add_plain_with_scaling_variant(
                ct.data[0], m, context_data
            )
            return Ciphertext(
                data=set_at(ct.data, 0, c0),
                parms_id=ct.parms_id,
                is_ntt_form=ct.is_ntt_form,
                scale=ct.scale,
            )
        if scheme == SchemeType.CKKS:
            if not plain.is_ntt_form:
                raise ValueError("plain must be in NTT form")
            context_data = self.context.get_context_data(plain.parms_id)
            if context_data is None:
                raise ValueError("plain is not valid for encryption parameters")
            ct = self._encrypt_zero_internal(plain.parms_id, is_asymmetric, c1_seed=c1_seed)
            # c0 += m in NTT domain (encryptor.cpp:227-252)
            c0 = add_poly(
                ct.data[0], np.asarray(plain.data), context_data.limb_constants
            )
            return Ciphertext(
                data=set_at(ct.data, 0, c0),
                parms_id=ct.parms_id,
                is_ntt_form=True,
                scale=plain.scale,
            )
        raise ValueError("unsupported scheme")
