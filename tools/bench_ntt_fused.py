"""A/B the fused two-stage (radix-4 view) NTT against per-stage radix-2
on the real TPU (ops/ntt.py FUSE_STAGES).

The two paths are bit-identical by construction (same butterfly sequence);
this measures whether eliding every second stage materialization moves the
HBM-bound NTT (PERF.md: ~12 ms bandwidth floor vs ~10 ms compute floor on
the headline step).  Prints poly-limb NTTs/s both ways, then the headline
CKKS mult+relin+rescale step both ways.

Honest-measurement rules from bench.py: checksum-returning jitted step,
single fetch drains the in-order stream.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_time(step, args, batch, iters):
    import numpy as np

    x = step(np.uint64(0), *args)
    int(x)  # compile + warm + sync
    if not iters:
        t0 = time.perf_counter()
        for i in range(3):
            x = step(np.uint64(i), *args)
        int(x)
        per = (time.perf_counter() - t0) / 3
        iters = max(5, min(500, int(2.0 / max(per, 1e-6))))
    t0 = time.perf_counter()
    for i in range(iters):
        x = step(np.uint64(i), *args)
    int(x)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-headline", action="store_true")
    cfg = ap.parse_args()

    if cfg.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemini_seal_tpu.modulus import CoeffModulus
    from gemini_seal_tpu.ops import ntt

    print("devices:", jax.devices())

    def checksum_jit(fn):
        return jax.jit(lambda salt, *a: jnp.sum(fn(*a), dtype=jnp.uint64) + salt)

    for n, bits in [(16384, [50, 40, 40, 40, 40, 50]), (8192, [50, 40, 40, 50])]:
        logn = n.bit_length() - 1
        mods = CoeffModulus.create(n, bits)
        L = len(mods)
        tabs = ntt.build_ntt_tables(logn, mods)
        rng = np.random.default_rng(0)
        x = np.stack(
            [rng.integers(0, m.value, (cfg.batch, 2, n), dtype=np.uint64)
             for m in mods], axis=2,
        )  # [B, 2, L, N]
        dx = jax.device_put(x)
        nttsteps = cfg.batch * 2 * L

        rates = {}
        try:
            for depth in (1, 2, 3, 4):
                ntt.FUSE_STAGES = depth
                fwd = checksum_jit(lambda v: ntt.ntt_forward(v, tabs))
                rates[(depth, "fwd")] = _sync_time(
                    lambda s, v: fwd(s, v), (dx,), nttsteps, cfg.iters)
                inv = checksum_jit(lambda v: ntt.ntt_inverse(v, tabs))
                rates[(depth, "inv")] = _sync_time(
                    lambda s, v: inv(s, v), (dx,), nttsteps, cfg.iters)
                print(f"N={n} k={depth} fwd: {rates[(depth, 'fwd')]:,.0f} "
                      f"inv: {rates[(depth, 'inv')]:,.0f} poly-limb NTTs/s "
                      f"({rates[(depth, 'fwd')] / rates[(1, 'fwd')]:.3f}x / "
                      f"{rates[(depth, 'inv')] / rates[(1, 'inv')]:.3f}x vs k=1)")
        finally:
            ntt.FUSE_STAGES = 2

    if cfg.skip_headline:
        return

    # Headline step A/B (bench.py shape: CKKS N=8192 {50,40,40,50}).
    from gemini_seal_tpu import (
        CKKSEncoder, CoeffModulus as CM, EncryptionParameters, Encryptor,
        KeyGenerator, SchemeType, SealContext,
    )
    from gemini_seal_tpu.models.pipelines import build_ckks_mul_relin_rescale

    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(8192)
    parms.set_coeff_modulus(CM.create(8192, [50, 40, 40, 50]))
    parms.set_random_seed(tuple(range(71, 79)))
    ctx = SealContext(parms)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    rk = kg.relin_keys()
    ct = enc.encrypt(encoder.encode([1.001] * encoder.slot_count, 2.0**40))
    rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
    B = cfg.batch
    a = np.broadcast_to(np.asarray(ct.data), (B,) + ct.data.shape)
    dev_a = jax.device_put(a)
    dev_rk = jax.device_put(rk_data)
    try:
        for depth in (1, 2, 3, 4):
            ntt.FUSE_STAGES = depth
            inner = build_ckks_mul_relin_rescale(ctx, fused=True)
            step = jax.jit(
                lambda salt, u, k: jnp.sum(inner(u, u, k), dtype=jnp.uint64) + salt
            )
            rate = _sync_time(step, (dev_a, dev_rk), B, cfg.iters)
            print(f"headline mul+relin+rescale N=8192 B={B} k={depth}: "
                  f"{rate:,.1f} ops/s")
    finally:
        ntt.FUSE_STAGES = 2


if __name__ == "__main__":
    main()
