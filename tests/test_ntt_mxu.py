"""Four-step MXU digit-matmul NTT: bit-exact parity with the radix-2
butterfly transform (ops/ntt.py), which is itself reference-pinned.

Covers canonical and lazy [0, 2p) inputs, jit execution, non-power
batch shapes, and the builder's 128-bit-headroom rejection of oversized
moduli.
"""

import numpy as np
import pytest

from gemini_seal_tpu.modulus import CoeffModulus, Modulus
from gemini_seal_tpu.ops import ntt, ntt_mxu


def _mods(n, bits, count=2):
    return CoeffModulus.create(max(n, 1024), [bits] * count)


@pytest.mark.parametrize("logn,bits", [(4, 30), (6, 36), (8, 50), (10, 54)])
def test_forward_inverse_bit_exact(logn, bits):
    n = 1 << logn
    mods = _mods(n, bits)
    tabs = ntt.build_ntt_tables(logn, mods)
    mx = ntt_mxu.build_mxu_ntt_tables(logn, mods)
    rng = np.random.default_rng(42 + logn)
    x = np.stack(
        [rng.integers(0, m.value, (3, n), dtype=np.uint64) for m in mods], axis=1
    )
    want = np.asarray(ntt.ntt_forward(x, tabs))
    got = np.asarray(ntt_mxu.ntt_forward_mxu(x, mx))
    assert np.array_equal(want, got)
    want_i = np.asarray(ntt.ntt_inverse(want, tabs))
    got_i = np.asarray(ntt_mxu.ntt_inverse_mxu(got, mx))
    assert np.array_equal(want_i, got_i)
    assert np.array_equal(got_i, x)


def test_lazy_input_range():
    """Inputs in [0, 2p) (the lazy chaining contract) must reduce
    identically to their canonical residues."""
    logn, n = 8, 256
    mods = _mods(n, 48)
    tabs = ntt.build_ntt_tables(logn, mods)
    mx = ntt_mxu.build_mxu_ntt_tables(logn, mods)
    rng = np.random.default_rng(3)
    xc = np.stack(
        [rng.integers(0, m.value, (2, n), dtype=np.uint64) for m in mods], axis=1
    )
    bump = np.stack(
        [rng.integers(0, 2, (2, n), dtype=np.uint64) * m.value for m in mods], axis=1
    )
    x_lazy = xc + bump
    got = np.asarray(ntt_mxu.ntt_forward_mxu(x_lazy, mx))
    want = np.asarray(ntt.ntt_forward(xc, tabs))
    assert np.array_equal(want, got)


def test_jit_path_matches_host():
    import jax

    logn, n = 7, 128
    mods = _mods(n, 50)
    mx = ntt_mxu.build_mxu_ntt_tables(logn, mods)
    rng = np.random.default_rng(9)
    x = np.stack(
        [rng.integers(0, m.value, (4, n), dtype=np.uint64) for m in mods], axis=1
    )
    host = np.asarray(ntt_mxu.ntt_forward_mxu(x, mx))
    jitted = jax.jit(lambda v: ntt_mxu.ntt_forward_mxu(v, mx))
    dev = np.asarray(jitted(x))
    assert np.array_equal(host, dev)
    inv = jax.jit(lambda v: ntt_mxu.ntt_inverse_mxu(v, mx))
    assert np.array_equal(np.asarray(inv(dev)), x)


def test_oversized_modulus_rejected():
    with pytest.raises(ValueError, match="128-bit MXU digit recombine"):
        ntt_mxu.build_mxu_ntt_tables(11, [Modulus((1 << 60) - (1 << 14) + 1)])


def test_digit_split_exact():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 56, 100, dtype=np.uint64)
    digs = ntt_mxu._balanced_digits_dev(x, 8, np)
    back = np.zeros(100, dtype=object)
    for d in range(8):
        back += digs[d].astype(object) * (256 ** d)
    assert all(int(b) == int(v) for b, v in zip(back, x))
