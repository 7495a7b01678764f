"""Validity-check tests (reference: native/tests/seal/... valcheck usage;
valcheck.h:32-197 semantics)."""

import numpy as np

from gemini_seal_tpu import (
    Ciphertext,
    CoeffModulus,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    PlainModulus,
    Plaintext,
    SchemeType,
    SecLevelType,
    SealContext,
)
from gemini_seal_tpu.valcheck import (
    is_buffer_valid,
    is_data_valid_for,
    is_metadata_valid_for,
    is_valid_for,
)


def make():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(64, 20))
    parms.set_random_seed(tuple(range(8)))
    ctx = SealContext(parms, sec_level=SecLevelType.none)
    return ctx, KeyGenerator(ctx)


def test_valid_objects_pass():
    ctx, kg = make()
    enc = Encryptor(ctx, public_key=kg.public_key())
    pt = Plaintext.from_hex("3x^2 + 2")
    ct = enc.encrypt(pt)
    assert is_valid_for(pt, ctx)
    assert is_valid_for(ct, ctx)
    assert is_valid_for(kg.secret_key, ctx)
    assert is_valid_for(kg.public_key(), ctx)
    assert is_valid_for(kg.relin_keys(), ctx)
    assert is_valid_for(kg.galois_keys(), ctx)


def test_wrong_context_rejected():
    ctx, kg = make()
    enc = Encryptor(ctx, public_key=kg.public_key())
    ct = enc.encrypt(Plaintext.from_hex("1"))

    parms2 = EncryptionParameters(SchemeType.BFV)
    parms2.set_poly_modulus_degree(128)
    parms2.set_coeff_modulus(CoeffModulus.create(128, [40, 40]))
    parms2.set_plain_modulus(257)
    ctx2 = SealContext(parms2, sec_level=SecLevelType.none)
    assert not is_metadata_valid_for(ct, ctx2)
    assert not is_valid_for(ct, ctx2)


def test_out_of_bound_data_rejected():
    ctx, kg = make()
    enc = Encryptor(ctx, public_key=kg.public_key())
    ct = enc.encrypt(Plaintext.from_hex("1"))
    bad = np.array(ct.data, copy=True)
    bad[0, 0, 0] = np.uint64(0xFFFFFFFFFFFFFFFF)  # >= q_0
    bad_ct = Ciphertext(bad, ct.parms_id, ct.is_ntt_form, ct.scale)
    assert is_metadata_valid_for(bad_ct, ctx)
    assert not is_data_valid_for(bad_ct, ctx)
    assert not is_valid_for(bad_ct, ctx)


def test_plain_too_long_rejected():
    ctx, _ = make()
    too_long = Plaintext(data=np.ones(65, dtype=np.uint64))
    assert not is_metadata_valid_for(too_long, ctx)
