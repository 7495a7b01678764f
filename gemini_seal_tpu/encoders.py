"""Encoders: BFV SIMD batching, CKKS canonical embedding, legacy integer.

TPU-native rework of the reference encoders
(reference: native/src/seal/batchencoder.{h,cpp}, ckks.{h,cpp},
intencoder.{h,cpp}, util/croots.{h,cpp}).

BatchEncoder: the 2x(N/2) matrix index map via generator 3 + the mod-t
negacyclic NTT.  CKKSEncoder: the canonical embedding C^{N/2} -> R with the
generator-5 slot map and the high-precision 2N-th complex roots (8-fold
symmetry); the embedding FFT runs vectorized on host in float64 — encode
is a host boundary, not a hot path.  Rounding semantics (round half away
from zero, the three coefficient-size regimes) match the reference exactly.
"""

from __future__ import annotations

import cmath
import math
from typing import List, Optional, Sequence, Union

import numpy as np

from .ciphertext import Plaintext
from .context import SealContext
from .ops.ntt import ntt_forward, ntt_inverse
from .params import PARMS_ID_ZERO, SchemeType
from .utils import numth

__all__ = ["BatchEncoder", "CKKSEncoder", "IntegerEncoder", "ComplexRoots"]


class ComplexRoots:
    """High-precision 2N-th complex roots with 8-fold symmetry
    (reference: util/croots.cpp)."""

    PI = 3.1415926535897932384626433832795028842

    def __init__(self, degree_of_roots: int):
        self.degree = degree_of_roots
        # 1/8 of the circle, exactly as the reference generates them.
        self._roots = [
            cmath.rect(1.0, 2 * self.PI * i / degree_of_roots)
            for i in range(degree_of_roots // 8 + 1)
        ]

    def get_root(self, index: int) -> complex:
        index &= self.degree - 1
        d = self.degree
        if index <= d // 8:
            return self._roots[index]
        if index <= d // 4:
            r = self._roots[d // 4 - index]
            return complex(r.imag, r.real)
        if index <= d // 2:
            return -self.get_root(d // 2 - index).conjugate()
        if index <= 3 * d // 4:
            return -self.get_root(index - d // 2)
        return self.get_root(d - index).conjugate()


class BatchEncoder:
    """BFV SIMD slots (reference: batchencoder.cpp).

    compat_gen3=True reproduces the reference's generator-3 index map
    (batchencoder.cpp:77-91) so slot ORDER interoperates with plaintexts
    batch-encoded by the reference; rotations on such data must then use
    generator-3 Galois elements (GaloisTool.get_elt_from_step(...,
    generator=3)) to act as row rotations.  The default generator-5 map
    matches the fork's GaloisTool (galois.h:169) so the standard
    rotate_rows/rotate_columns keys permute slots correctly (README
    deviation #2)."""

    def __init__(self, context: SealContext, compat_gen3: bool = False):
        if not context.parameters_set():
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        if not cd.qualifiers.using_batching:
            raise ValueError("encryption parameters are not valid for batching")
        self.context = context
        self.slots = cd.parms.poly_modulus_degree
        self.generator = 3 if compat_gen3 else 5
        self._index_map = self._populate_index_map()

    @property
    def slot_count(self) -> int:
        return self.slots

    def _populate_index_map(self) -> np.ndarray:
        """2x(N/2) matrix map, bit-reversed (batchencoder.cpp:69-91).

        Deviation: the reference builds this map with generator 3 while the
        fork's GaloisTool rotates with generator 5 (galois.h:169) — which,
        combined with the fork's BFV key-switch bug, leaves BFV batching
        rotations broken in the reference.  We use generator 5 by default so
        rotate_rows/rotate_columns permute slots correctly; compat_gen3
        gives the reference-interoperable order."""
        n = self.slots
        logn = numth.get_power_of_two(n)
        row_size = n >> 1
        m = n << 1
        gen, pos = self.generator, 1
        index_map = np.zeros(n, dtype=np.int64)
        for i in range(row_size):
            index1 = (pos - 1) >> 1
            index2 = (m - pos - 1) >> 1
            index_map[i] = numth.reverse_bits(index1, logn)
            index_map[row_size | i] = numth.reverse_bits(index2, logn)
            pos = (pos * gen) & (m - 1)
        return index_map

    def encode(self, values: Sequence[int]) -> Plaintext:
        """uint64/int64 slot values -> plaintext poly
        (batchencoder.cpp:115-198)."""
        cd = self.context.first_context_data()
        t = cd.parms.plain_modulus.value
        if len(values) > self.slots:
            raise ValueError("values_matrix size is too large")
        try:
            vals = np.asarray(list(values), dtype=np.int64)
        except OverflowError:
            raise ValueError("input value is larger than plain_modulus")
        if vals.size and (int(vals.min()) < -t or int(vals.max()) >= t):
            raise ValueError("input value is larger than plain_modulus")
        vals = np.where(vals < 0, vals + t, vals).astype(np.uint64)
        dest = np.zeros(self.slots, dtype=np.uint64)
        dest[self._index_map[: vals.size]] = vals
        out = ntt_inverse(
            np.asarray(dest[None, :]), cd.plain_ntt_tables
        )
        return Plaintext(data=np.asarray(out[0], dtype=np.uint64))

    def decode(self, plain: Plaintext, signed: bool = False) -> List[int]:
        """plaintext poly -> slot values (batchencoder.cpp:339-420)."""
        if plain.is_ntt_form:
            raise ValueError("plain cannot be in NTT form")
        cd = self.context.first_context_data()
        t = cd.parms.plain_modulus.value
        temp = np.zeros(self.slots, dtype=np.uint64)
        pdata = np.asarray(plain.data)
        temp[: min(pdata.shape[0], self.slots)] = pdata[: self.slots]
        vals = np.asarray(ntt_forward(temp[None, :], cd.plain_ntt_tables))[0]
        out = vals[self._index_map].astype(np.int64)
        if signed:
            half = t >> 1
            out = np.where(out > half, out - t, out)
        return [int(v) for v in out]


class CKKSEncoder:
    """CKKS canonical embedding (reference: ckks.{h,cpp})."""

    def __init__(self, context: SealContext):
        if not context.parameters_set():
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        self.context = context
        n = cd.parms.poly_modulus_degree
        self.slots = n >> 1
        logn = numth.get_power_of_two(n)
        self._logn = logn
        self._n = n

        # generator-5 slot map (ckks.cpp:37-56)
        m = n << 1
        gen, pos = 5, 1
        index_map = np.zeros(n, dtype=np.int64)
        for i in range(self.slots):
            index1 = (pos - 1) >> 1
            index2 = (m - pos - 1) >> 1
            index_map[i] = numth.reverse_bits(index1, logn)
            index_map[self.slots | i] = numth.reverse_bits(index2, logn)
            pos = (pos * gen) & (m - 1)
        self._index_map = index_map

        # bit-reversed root tables (ckks.cpp:58-77)
        roots = np.zeros(n, dtype=np.complex128)
        if m >= 8:
            croots = ComplexRoots(m)
            for i in range(n):
                roots[i] = croots.get_root(numth.reverse_bits(i, logn))
        elif m == 4:
            roots[0] = 1j
            roots[1] = -1j
        self._roots = roots
        self._inv_roots = np.conj(roots)

    @property
    def slot_count(self) -> int:
        return self.slots

    # -- embedding FFTs (vectorized versions of ckks.h:458-482, 723-744) --
    def _embedding_inverse(self, a: np.ndarray) -> np.ndarray:
        n = self._n
        logn = self._logn
        tt = 1
        for i in range(logn):
            mm = 1 << (logn - i)
            h = mm >> 1
            s = self._inv_roots[h : 2 * h][:, None]       # [h, 1]
            a = a.reshape(h, 2, tt)
            u = a[:, 0, :]
            v = a[:, 1, :]
            a = np.stack([u + v, (u - v) * s], axis=1).reshape(n)
            tt <<= 1
        return a

    def _embedding_forward(self, a: np.ndarray) -> np.ndarray:
        n = self._n
        logn = self._logn
        tt = n
        for i in range(logn):
            mm = 1 << i
            tt >>= 1
            s = self._roots[mm : 2 * mm][:, None]
            a = a.reshape(mm, 2, tt)
            u = a[:, 0, :]
            v = a[:, 1, :] * s
            a = np.stack([u + v, u - v], axis=1).reshape(n)
        return a

    # -- encode ----------------------------------------------------------
    def encode(
        self,
        values: Union[float, complex, Sequence],
        scale: float,
        parms_id=None,
    ) -> Plaintext:
        """values (<= N/2 slots of double/complex) -> NTT-form RNS plaintext
        (reference: ckks.h:405-617)."""
        if parms_id is None:
            parms_id = self.context.first_parms_id
        cd = self.context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        parms = cd.parms
        coeff_modulus = parms.coeff_modulus
        L = len(coeff_modulus)
        n = self._n

        if isinstance(values, (int, float)):
            return self._encode_scalar(float(values), scale, cd)
        if isinstance(values, complex):
            values = [values] * self.slots
        values = list(values)
        if len(values) > self.slots:
            raise ValueError("values_size is too large")
        if scale <= 0 or int(math.log2(scale)) + 1 >= cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")

        conj_values = np.zeros(n, dtype=np.complex128)
        for i, v in enumerate(values):
            conj_values[self._index_map[i]] = v
            conj_values[self._index_map[i + self.slots]] = np.conj(complex(v))

        conj_values = self._embedding_inverse(conj_values)
        n_inv = (1.0 / n) * scale
        conj_values *= n_inv

        reals = conj_values.real
        d = np.maximum(np.abs(reals), 1.0)
        max_coeff_bit_count = int(np.max(np.floor(np.log2(d)))) + 2
        if max_coeff_bit_count >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded values are too large")

        dest = self._round_and_decompose(reals, cd, max_coeff_bit_count)
        out = np.asarray(ntt_forward(dest, cd.ntt_tables), dtype=np.uint64)
        return Plaintext(data=out, parms_id=cd.parms_id, scale=scale)

    def _encode_scalar(self, value: float, scale: float, cd) -> Plaintext:
        """Constant encode: all slots equal -> constant polynomial
        (reference: ckks.cpp:80-230)."""
        if scale <= 0 or int(math.log2(scale)) + 1 >= cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")
        coeffd = value * scale
        if abs(coeffd) >= 2.0 ** cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded value is too large")
        n = self._n
        coeffs = np.full(n, coeffd, dtype=np.float64)
        bitcount = int(math.log2(max(abs(coeffd), 1.0))) + 2
        dest = self._round_and_decompose(coeffs, cd, bitcount)
        # constant poly: no embedding, no NTT needed except representation
        out = np.asarray(ntt_forward(dest, cd.ntt_tables), dtype=np.uint64)
        # NTT of a constant is the constant itself in every slot, but we keep
        # the uniform path for clarity.
        return Plaintext(data=out, parms_id=cd.parms_id, scale=scale)

    def encode_int(self, value: int, parms_id=None) -> Plaintext:
        """Integer encode at scale 1 (reference: ckks.cpp:232-274)."""
        if parms_id is None:
            parms_id = self.context.first_parms_id
        cd = self.context.get_context_data(parms_id)
        coeff_modulus = cd.parms.coeff_modulus
        n = self._n
        L = len(coeff_modulus)
        dest = np.zeros((L, n), dtype=np.uint64)
        for j, mod in enumerate(coeff_modulus):
            dest[j, :] = value % mod.value
        out = np.asarray(ntt_forward(dest, cd.ntt_tables), dtype=np.uint64)
        return Plaintext(data=out, parms_id=cd.parms_id, scale=1.0)

    def _round_and_decompose(self, reals: np.ndarray, cd, bitcount: int) -> np.ndarray:
        """Round half away from zero; decompose into RNS via the reference's
        three size regimes (ckks.h:514-607)."""
        parms = cd.parms
        coeff_modulus = parms.coeff_modulus
        L = len(coeff_modulus)
        n = reals.shape[0]
        dest = np.zeros((L, n), dtype=np.uint64)
        # round half away from zero (std::round)
        rounded = np.sign(reals) * np.floor(np.abs(reals) + 0.5)
        if bitcount <= 52:
            # exact in int64 via float (fast vector path)
            as_int = rounded.astype(np.int64)
            for j, mod in enumerate(coeff_modulus):
                dest[j] = np.mod(as_int, mod.value).astype(np.uint64)
        else:
            for i in range(n):
                coeffd = float(rounded[i])
                is_negative = math.copysign(1.0, coeffd) < 0
                coeffu = int(abs(coeffd))
                residues = cd.rns_base.decompose(coeffu)
                for j, mod in enumerate(coeff_modulus):
                    r = residues[j]
                    dest[j, i] = (mod.value - r) % mod.value if is_negative else r
        return dest

    # -- decode ----------------------------------------------------------
    def decode(self, plain: Plaintext, as_complex: bool = False):
        """NTT-form RNS plaintext -> slot values (reference: ckks.h:620-750)."""
        if not plain.is_ntt_form:
            raise ValueError("plain is not in NTT form")
        cd = self.context.get_context_data(plain.parms_id)
        parms = cd.parms
        L = len(parms.coeff_modulus)
        n = self._n
        if plain.scale <= 0 or int(math.log2(plain.scale)) >= cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")

        inv_scale = 1.0 / plain.scale
        data = np.asarray(
            ntt_inverse(np.asarray(plain.data, dtype=np.uint64), cd.ntt_tables),
            dtype=np.uint64,
        )  # [L, N]
        big = cd.rns_base.compose_array(data)  # python ints, length N
        q = cd.total_coeff_modulus
        upper_half = cd.upper_half_threshold

        res = np.zeros(n, dtype=np.complex128)
        two_pow_64 = 2.0 ** 64
        for i in range(n):
            v = big[i]
            acc = 0.0
            if v >= upper_half:
                # centered negative: sum signed limb differences vs q
                diff = v - q  # negative python int
                # replicate the reference's per-limb ladder in double
                scaled = inv_scale
                dv = diff
                # ladder over 64-bit limbs of |diff| with sign
                limbs = []
                x = abs(dv)
                while x:
                    limbs.append(x & 0xFFFFFFFFFFFFFFFF)
                    x >>= 64
                for limb in limbs:
                    acc -= float(limb) * scaled if dv < 0 else -float(limb) * scaled
                    scaled *= two_pow_64
            else:
                scaled = inv_scale
                x = v
                while x:
                    acc += float(x & 0xFFFFFFFFFFFFFFFF) * scaled
                    scaled *= two_pow_64
                    x >>= 64
            res[i] = acc

        res = self._embedding_forward(res)
        out = [res[self._index_map[i]] for i in range(self.slots)]
        if as_complex:
            return [complex(v) for v in out]
        return [float(v.real) for v in out]


class IntegerEncoder:
    """Legacy base-2 signed-digit integer encoder (BFV only)
    (reference: intencoder.{h,cpp})."""

    def __init__(self, context: SealContext):
        cd = context.first_context_data()
        if cd.parms.scheme != SchemeType.BFV:
            raise ValueError("unsupported scheme")
        self.context = context
        self.plain_modulus = cd.parms.plain_modulus.value

    def encode(self, value: int) -> Plaintext:
        t = self.plain_modulus
        if value == 0:
            return Plaintext(data=np.zeros(1, dtype=np.uint64))
        negative = value < 0
        mag = abs(value)
        bits = []
        while mag:
            bits.append(mag & 1)
            mag >>= 1
        coeffs = np.zeros(len(bits), dtype=np.uint64)
        for i, b in enumerate(bits):
            if b:
                coeffs[i] = (t - 1) if negative else 1
        return Plaintext(data=coeffs)

    def decode(self, plain: Plaintext) -> int:
        t = self.plain_modulus
        half = t >> 1
        total = 0
        coeffs = np.asarray(plain.data)
        for i in range(len(coeffs) - 1, -1, -1):
            c = int(coeffs[i])
            digit = c - t if c > half else c
            total = total * 2 + digit
        return total
