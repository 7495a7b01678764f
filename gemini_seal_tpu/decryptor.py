"""Decryptor (reference: native/src/seal/decryptor.{h,cpp}).

BFV: NTT-domain dot product sum_i c_i s^i, then the exact {t, gamma}
scale-and-round (rns.cpp:1070-1126).  CKKS: the dot product is the RNS NTT
plaintext.  invariant_noise_budget mirrors decryptor.cpp:269-325.
"""

from __future__ import annotations

import numpy as np

from .ciphertext import Ciphertext, Plaintext
from .context import SealContext
from .keys import SecretKey
from .ops.dyadic import add_poly, dyadic_product, multiply_poly_scalar
from .ops.ntt import ntt_forward_lazy, ntt_inverse, ntt_forward
from .ops.rnsops import decrypt_scale_and_round
from .params import PARMS_ID_ZERO, SchemeType

__all__ = ["Decryptor"]


class Decryptor:
    def __init__(self, context: SealContext, secret_key: SecretKey):
        if not context.parameters_set():
            raise ValueError("encryption parameters are not set correctly")
        if secret_key.parms_id != context.key_parms_id:
            raise ValueError("secret key is not valid for encryption parameters")
        self.context = context
        # powers of s cache at key level (decryptor.cpp:44-49, 151-208)
        self._sk_powers = [secret_key.data]

    def _compute_sk_powers(self, max_power: int):
        cd = self.context.key_context_data()
        limbs = cd.limb_constants
        while len(self._sk_powers) < max_power:
            self._sk_powers.append(
                dyadic_product(self._sk_powers[-1], self._sk_powers[0], limbs)
            )

    def _dot_product_ct_sk(self, encrypted: Ciphertext):
        """c_0 + c_1 s + ... + c_{k-1} s^{k-1} mod q, in the ciphertext's
        (NTT or coefficient) domain (decryptor.cpp:218-267)."""
        cd = self.context.get_context_data(encrypted.parms_id)
        limbs = cd.limb_constants
        tables = cd.ntt_tables
        L = encrypted.coeff_modulus_size
        size = encrypted.size
        self._compute_sk_powers(size - 1)

        cs = encrypted.data[1:]
        if not encrypted.is_ntt_form:
            cs = ntt_forward(cs, tables)
        acc = None
        for i in range(size - 1):
            term = dyadic_product(cs[i], self._sk_powers[i][:L, :], limbs)
            acc = term if acc is None else add_poly(acc, term, limbs)
        if not encrypted.is_ntt_form:
            acc = ntt_inverse(acc, tables)
        return add_poly(acc, encrypted.data[0], limbs)

    def decrypt(self, encrypted: Ciphertext) -> Plaintext:
        cd = self.context.get_context_data(encrypted.parms_id)
        if cd is None:
            raise ValueError("encrypted is not valid for encryption parameters")
        scheme = cd.parms.scheme
        if scheme == SchemeType.BFV:
            if encrypted.is_ntt_form:
                raise ValueError("encrypted cannot be in NTT form")
            acc = self._dot_product_ct_sk(encrypted)
            plain = decrypt_scale_and_round(acc, cd.device_rns_tool)
            coeffs = np.asarray(plain, dtype=np.uint64)
            # trim to significant coefficients (decryptor.cpp:109-114)
            nz = np.nonzero(coeffs)[0]
            count = int(nz[-1]) + 1 if nz.size else 1
            return Plaintext(data=coeffs[:count], parms_id=PARMS_ID_ZERO)
        if scheme == SchemeType.CKKS:
            if not encrypted.is_ntt_form:
                raise ValueError("encrypted must be in NTT form")
            acc = self._dot_product_ct_sk(encrypted)
            return Plaintext(
                data=np.asarray(acc, dtype=np.uint64),
                parms_id=encrypted.parms_id,
                scale=encrypted.scale,
            )
        raise ValueError("unsupported scheme")

    def decrypt_batch(self, data, parms_id, is_ntt_form: bool,
                      scale: float = 1.0):
        """Decrypt a BATCH of ciphertexts held as one raw tensor — the
        serving egress path (pipelines emit u64[B, size, L, N]; decrypting
        them one Ciphertext at a time repeats the s-power dot product B
        times in Python).  All batch elements share metadata.  Returns a
        list of Plaintexts, identical to per-ciphertext decrypt() (no
        reference analogue: its API is strictly one ciphertext per call).
        """
        cd = self.context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        data = np.asarray(data, dtype=np.uint64)
        if data.ndim != 4:
            raise ValueError("decrypt_batch expects u64[B, size, L, N]")
        scheme = cd.parms.scheme
        limbs = cd.limb_constants
        tables = cd.ntt_tables
        B, size, L, _ = data.shape
        self._compute_sk_powers(size - 1)

        cs = data[:, 1:, :, :]
        if not is_ntt_form:
            cs = ntt_forward(cs, tables)
        acc = None
        for i in range(size - 1):
            term = dyadic_product(cs[:, i], self._sk_powers[i][:L, :], limbs)
            acc = term if acc is None else add_poly(acc, term, limbs)
        if not is_ntt_form:
            acc = ntt_inverse(acc, tables)
        acc = add_poly(acc, data[:, 0], limbs)        # [B, L, N]

        if scheme == SchemeType.BFV:
            if is_ntt_form:
                raise ValueError("encrypted cannot be in NTT form")
            plains = np.asarray(
                decrypt_scale_and_round(acc, cd.device_rns_tool),
                dtype=np.uint64,
            )
            out = []
            for b in range(B):
                coeffs = plains[b]
                nz = np.nonzero(coeffs)[0]
                count = int(nz[-1]) + 1 if nz.size else 1
                out.append(Plaintext(data=coeffs[:count], parms_id=PARMS_ID_ZERO))
            return out
        if scheme == SchemeType.CKKS:
            if not is_ntt_form:
                raise ValueError("encrypted must be in NTT form")
            return [
                Plaintext(data=np.asarray(acc[b], dtype=np.uint64),
                          parms_id=parms_id, scale=scale)
                for b in range(B)
            ]
        raise ValueError("unsupported scheme")

    def invariant_noise_budget(self, encrypted: Ciphertext) -> int:
        """Bits of noise budget remaining (decryptor.cpp:269-325)."""
        cd = self.context.get_context_data(encrypted.parms_id)
        if cd.parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        if encrypted.is_ntt_form:
            raise ValueError("encrypted cannot be in NTT form")
        limbs = cd.limb_constants
        t = cd.parms.plain_modulus.value
        acc = self._dot_product_ct_sk(encrypted)
        noise = multiply_poly_scalar(acc, np.uint64(t), limbs)
        # CRT-compose on host and take the centered infinity norm
        res = np.asarray(noise)
        big = cd.rns_base.compose_array(res)
        q = cd.total_coeff_modulus
        half = q >> 1
        norm = 0
        for v in big:
            mag = q - v if v > half else v
            if mag > norm:
                norm = mag
        bit_diff = cd.total_coeff_modulus_bit_count - norm.bit_length() - 1
        return max(0, bit_diff)
