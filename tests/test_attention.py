"""Encrypted single-head attention (build_ckks_attention): Q, K^T, V all
encrypted; softmax(Q K^T / sqrt(d)) @ V decrypts to the numpy attention
within the composed approximation budget (deg-4 exp Taylor + Goldschmidt
reciprocal).  No reference analogue at any layer."""

import numpy as np

from gemini_seal_tpu import (
    CKKSEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    SchemeType,
    SealContext,
    SecLevelType,
)
from gemini_seal_tpu.ciphertext import Ciphertext
from gemini_seal_tpu.models.pipelines import build_ckks_attention


def test_encrypted_attention_matches_numpy():
    d = 4
    n = 2 * d * d
    iters = 4
    n_levels = 14 + iters
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(
        CoeffModulus.create(n, [50] + [40] * n_levels + [50]))
    parms.set_random_seed(tuple(range(11, 19)))
    ctx = SealContext(parms, sec_level=SecLevelType.none)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    dec = Decryptor(ctx, kg.secret_key)
    scale = 2.0 ** 40

    run, out_pid, out_scale, rot_steps = build_ckks_attention(
        ctx, d, scale, encoder, iters=iters)
    tool = ctx.first_context_data().galois_tool
    elts = [tool.get_elt_from_step(st) for st in rot_steps]
    gk = kg.galois_keys(elts)
    rot_stack = gk.stacked(*elts)
    rks = kg.relin_keys().stacked(2)

    rng = np.random.default_rng(23)
    Q = rng.uniform(-0.5, 0.5, (d, d))
    K = rng.uniform(-0.5, 0.5, (d, d))
    V = rng.uniform(-0.5, 0.5, (d, d))

    def pack(M):
        return enc.encrypt(encoder.encode(M.reshape(-1).tolist(), scale))

    ctQ, ctKT, ctV = pack(Q), pack(K.T), pack(V)
    out = np.asarray(run(np.asarray(ctQ.data), np.asarray(ctKT.data),
                         np.asarray(ctV.data), rot_stack, rks))
    got = np.asarray(encoder.decode(dec.decrypt(
        Ciphertext(out, out_pid, True, out_scale))))[: d * d].reshape(d, d)

    S = Q @ K.T / np.sqrt(d)
    P = np.exp(S) / np.exp(S).sum(axis=1, keepdims=True)
    want = P @ V
    err = np.abs(got - want).max()
    assert err < 5e-3, f"attention error {err:.2e}"
