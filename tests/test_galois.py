"""GaloisTool unit tests with pinned values
(reference: tests/seal/util/galois.cpp — its elt-map expectations are for
stock SEAL's generator 3, which our generator=3 compat path reproduces;
the fork's default generator is 5, pinned here explicitly, and the
apply_galois[_ntt] vectors are generator-independent)."""

import numpy as np
import pytest

from gemini_seal_tpu.ops.dyadic import LimbConstants
from gemini_seal_tpu.ops.galois import GaloisTool


def test_elt_from_step_generator5():
    """Fork default (generator 5; galois.h:169), coeff_count_power=3."""
    tool = GaloisTool(3)            # n = 8, m = 16
    assert tool.get_elt_from_step(0) == 15
    assert tool.get_elt_from_step(1) == 5
    assert tool.get_elt_from_step(2) == (5 * 5) % 16       # 9
    assert tool.get_elt_from_step(3) == (5 ** 3) % 16      # 13
    assert tool.get_elt_from_step(-1) == (5 ** 3) % 16     # (n/2 - 1) steps
    assert tool.get_elt_from_step(-3) == 5
    with pytest.raises(ValueError):
        tool.get_elt_from_step(4)   # >= n/2


def test_elt_from_step_generator3_matches_reference():
    """Stock-SEAL pinned values (tests/seal/util/galois.cpp:27-41) via the
    compat generator."""
    tool = GaloisTool(3)
    for step, want in ((0, 15), (1, 3), (-3, 3), (2, 9), (-2, 9),
                       (3, 11), (-1, 11)):
        assert tool.get_elt_from_step(step, generator=3) == want, step


def test_index_from_elt():
    """tests/seal/util/galois.cpp:71-77."""
    from gemini_seal_tpu.keys import GaloisKeys

    assert GaloisKeys.get_index(15) == 7
    assert GaloisKeys.get_index(3) == 1
    assert GaloisKeys.get_index(9) == 4
    assert GaloisKeys.get_index(11) == 5


def test_apply_galois_pinned():
    """tests/seal/util/galois.cpp:79-95 (power basis, elt=3, q=17, n=8)."""
    tool = GaloisTool(3)
    limbs = LimbConstants.from_moduli([17])
    x = np.arange(8, dtype=np.uint64)[None, :]
    out = np.asarray(tool.apply_galois(x, 3, limbs))[0]
    np.testing.assert_array_equal(
        out, np.array([0, 14, 6, 1, 13, 7, 2, 12], dtype=np.uint64)
    )


def test_apply_galois_ntt_pinned():
    """tests/seal/util/galois.cpp:97-113 (NTT domain, elt=3, n=8)."""
    tool = GaloisTool(3)
    x = np.arange(8, dtype=np.uint64)[None, :]
    out = np.asarray(tool.apply_galois_ntt(x, 3))[0]
    np.testing.assert_array_equal(
        out, np.array([4, 5, 7, 6, 1, 0, 2, 3], dtype=np.uint64)
    )


def test_apply_galois_involution():
    """elt * elt^{-1} mod 2n composes to identity in both domains."""
    tool = GaloisTool(4)            # n = 16, m = 32
    elt = tool.get_elt_from_step(1)
    inv = pow(elt, -1, 32)
    limbs = LimbConstants.from_moduli([97])
    rng = np.random.default_rng(3)
    x = rng.integers(0, 97, size=(1, 16), dtype=np.uint64)
    y = tool.apply_galois(tool.apply_galois(x, elt, limbs), inv, limbs)
    np.testing.assert_array_equal(np.asarray(y), x)
    yn = tool.apply_galois_ntt(tool.apply_galois_ntt(x, elt), inv)
    np.testing.assert_array_equal(np.asarray(yn), x)
