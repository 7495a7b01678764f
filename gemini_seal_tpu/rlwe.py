"""RLWE zero-encryptions (reference: native/src/seal/util/rlwe.cpp:131-302).

Host-plane sampling + NTT (numpy; the jitted pipelines are the device plane).  The pk/sk tensors at
the key level are limb-prefix-sliced for encryptions at lower levels —
the RNS chain drops moduli from the tail, so rows [0:L] of a key-level
[L_key, N] tensor are exactly the lower level's limbs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ciphertext import Ciphertext
from .keys import PublicKey, SecretKey
from .ops import modops
from .ops.dyadic import add_poly, dyadic_product, negate_poly
from .ops.ntt import ntt_forward, ntt_inverse
from .utils.blake2 import Blake2xbPRNG
from .utils.prng import (
    BlakePRNGFactory,
    sample_poly_normal,
    sample_poly_ternary,
    sample_poly_uniform,
)

__all__ = ["encrypt_zero_asymmetric", "encrypt_zero_symmetric", "parms_rng"]


def parms_rng(parms) -> Blake2xbPRNG:
    """The parameter set's PRNG factory (seeded when parms.random_seed is
    pinned, fresh system entropy otherwise)."""
    return BlakePRNGFactory(parms.random_seed).create()


def encrypt_zero_asymmetric(
    public_key: PublicKey, context, parms_id, is_ntt_form: bool
) -> Ciphertext:
    """(pk[j] * u + e[j])_j with u ternary, e Gaussian
    (reference: rlwe.cpp:131-202)."""
    context_data = context.get_context_data(parms_id)
    parms = context_data.parms
    moduli = [m.value for m in parms.coeff_modulus]
    L = len(moduli)
    n = parms.poly_modulus_degree
    tables = context_data.ntt_tables
    limbs = context_data.limb_constants
    size = public_key.data.size

    rng = parms_rng(parms)

    # u <- R_3, to NTT domain
    u = np.asarray(sample_poly_ternary(rng, moduli, n))
    u_ntt = ntt_forward(u, tables)

    pk = public_key.data.data[:, :L, :]  # limb-prefix at this level
    cs = []
    for j in range(size):
        c = dyadic_product(u_ntt, pk[j], limbs)
        if not is_ntt_form:
            c = ntt_inverse(c, tables)
        cs.append(c)

    # e_j <- chi, added in the target domain
    out = []
    for j in range(size):
        e = np.asarray(sample_poly_normal(rng, moduli, n))
        if is_ntt_form:
            e = ntt_forward(e, tables)
        out.append(add_poly(cs[j], e, limbs))

    return Ciphertext(
        data=np.stack(out),
        parms_id=context_data.parms_id,
        is_ntt_form=is_ntt_form,
        scale=1.0,
    )


def encrypt_zero_symmetric(
    secret_key: SecretKey,
    context,
    parms_id,
    is_ntt_form: bool,
    c1_rng: Optional[Blake2xbPRNG] = None,
    c1_seed: Optional[tuple] = None,
) -> Ciphertext:
    """(c0, c1) = ([-(a s + e)]_q, a) (reference: rlwe.cpp:204-302).

    c1 is drawn from its own PRNG (`c1_rng`), mirroring the reference's
    separate seed-publishable generator; defaults to fresh entropy (or a
    derived stream when the parameter seed is pinned, for reproducibility).

    When `c1_seed` is given, the seeded dataflow is used (rlwe.cpp
    save_seed=true): the raw uniform sample IS the stored c1 in the
    ciphertext's own domain, so a receiver can regenerate it from the seed
    alone — for BFV the sample is treated as power basis and forward-NTT'd
    only to compute c0.
    """
    context_data = context.get_context_data(parms_id)
    parms = context_data.parms
    coeff_modulus = parms.coeff_modulus
    moduli = [m.value for m in coeff_modulus]
    L = len(moduli)
    n = parms.poly_modulus_degree
    tables = context_data.ntt_tables
    limbs = context_data.limb_constants

    rng_error = parms_rng(parms)
    if c1_seed is not None:
        c1_rng = Blake2xbPRNG(tuple(int(s) for s in c1_seed))
    elif c1_rng is None:
        if parms.random_seed is not None:
            # deterministic-but-distinct stream for reproducible tests
            c1_rng = Blake2xbPRNG(tuple((s ^ 0xA5A5A5A5A5A5A5A5) for s in parms.random_seed))
        else:
            c1_rng = BlakePRNGFactory().create()

    # a (= c1) uniform, sampled directly in the ciphertext's domain
    c1 = np.asarray(sample_poly_uniform(c1_rng, coeff_modulus, n))
    seeded_bfv = c1_seed is not None and not is_ntt_form

    e = np.asarray(sample_poly_normal(rng_error, moduli, n))

    sk = secret_key.data[:L, :]
    a_ntt = ntt_forward(c1, tables) if seeded_bfv else c1
    c0 = dyadic_product(sk, a_ntt, limbs)
    if is_ntt_form:
        e = ntt_forward(e, tables)
    else:
        c0 = ntt_inverse(c0, tables)
        if not seeded_bfv:
            c1 = ntt_inverse(c1, tables)
    c0 = negate_poly(add_poly(e, c0, limbs), limbs)

    return Ciphertext(
        data=np.stack([c0, c1]),
        parms_id=context_data.parms_id,
        is_ntt_form=is_ntt_form,
        scale=1.0,
    )
