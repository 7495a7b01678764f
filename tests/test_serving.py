"""EncryptedComputeServer: SEAL-wire blobs in -> jitted pipeline ->
SEAL-wire blobs out, with batch padding to the compiled size."""

import numpy as np
import pytest

from gemini_seal_tpu import (
    CKKSEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    SchemeType,
    SecLevelType,
    SealContext,
)
from gemini_seal_tpu import serialization as ser
from gemini_seal_tpu.models.pipelines import build_ckks_dense_layer
from gemini_seal_tpu.models.serving import EncryptedComputeServer

SEED = tuple(range(41, 49))


def test_wire_to_wire_dense_layer():
    parms = EncryptionParameters(SchemeType.CKKS)
    n = 256
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [50, 40, 40, 50]))
    parms.set_random_seed(SEED)
    ctx = SealContext(parms, sec_level=SecLevelType.none)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    dec = Decryptor(ctx, kg.secret_key)
    tool = ctx.first_context_data().galois_tool
    rk = kg.relin_keys()
    scale = 2.0 ** 40
    dim = 4

    rng = np.random.default_rng(3)
    M = rng.uniform(-0.5, 0.5, size=(dim, dim))
    b = rng.uniform(-0.2, 0.2, size=dim)
    slots = encoder.slot_count
    diagonals = {
        d: [M[i % dim, (i + d) % dim] for i in range(slots)] for d in range(dim)
    }
    bias = [b[i % dim] for i in range(slots)]
    steps = sorted(s for s in diagonals if s != 0)
    elts = [tool.get_elt_from_step(s) for s in steps]
    gk = kg.galois_keys(elts)

    layer, out_id, out_scale = build_ckks_dense_layer(
        ctx, diagonals, bias, scale, encoder
    )
    server = EncryptedComputeServer(
        ctx, layer, [gk.stacked(*elts), rk.stacked(2)],
        out_parms_id=out_id, out_is_ntt=True, out_scale=out_scale,
        batch_size=4, compr_mode=ser.COMPR_DEFLATE,
    )

    # three clients, each shipping a wire-format request (batch < compiled)
    xs = [rng.uniform(-1, 1, size=dim) for _ in range(3)]
    blobs = [
        ser.save(enc.encrypt(encoder.encode(
            [x[i % dim] for i in range(slots)], scale)))
        for x in xs
    ]
    outs = server.submit(blobs)
    assert len(outs) == 3
    for x, blob in zip(xs, outs):
        ct = ser.load_ciphertext(blob, ctx)
        got = encoder.decode(dec.decrypt(ct))
        want = (M @ x + b) ** 2
        for g, w in zip(got[:dim], want):
            assert abs(g - w) < 1e-3

    # oversize batch is rejected, empty batch is a no-op
    with pytest.raises(ValueError, match="exceeds compiled"):
        server.submit(blobs * 2)
    assert server.submit([]) == []

    # a tampered blob is rejected at the validation boundary
    bad = bytearray(blobs[0])
    bad[40] ^= 0xFF
    with pytest.raises(Exception):
        server.submit([bytes(bad)])
