"""Benchmark harness: CKKS multiply+relinearize+rescale throughput.

Mirrors the reference's measurement methodology
(native/examples/7_performance.cpp: per-op wall clock averaged over
iterations) on BASELINE config 4's hot op — ciphertext multiply +
relinearize + rescale at N=8192, CKKS {50,40,40,50}, scale 2^40.

Baseline: the reference has no published numbers (BASELINE.md), so the
comparison point was measured by compiling the reference C++ (g++ -O3
-march=native, single thread — its only execution mode) on this machine:
    mult+relin+rescale: 5983.7 us/op  ->  167.1 ops/s
(Harness: /tmp/refbench.cpp pattern; CKKS N=8192, Create(8192,{50,40,40,50}),
n_special_primes=1.)

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

# Persistent compilation cache (first compile through the axon tunnel is
# expensive; later runs hit the disk cache).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REF_OPS_PER_S = 1e6 / 5983.7  # reference C++ on this host (see docstring)


def main():
    import jax
    import jax.numpy as jnp

    from gemini_seal_tpu import (
        CKKSEncoder,
        CoeffModulus,
        EncryptionParameters,
        Encryptor,
        KeyGenerator,
        SchemeType,
        SealContext,
    )
    from gemini_seal_tpu.models.pipelines import build_ckks_mul_relin_rescale

    n = 8192
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [50, 40, 40, 50]))
    parms.set_random_seed(tuple(range(71, 79)))
    ctx = SealContext(parms)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    rk = kg.relin_keys()

    scale = 2.0 ** 40
    vals = [1.001] * encoder.slot_count
    ct = enc.encrypt(encoder.encode(vals, scale))
    rk_data = jnp.stack([pk.data.data for pk in rk.key(2)])

    a = jnp.broadcast_to(ct.data, (batch,) + ct.data.shape)
    b = a

    step = jax.jit(build_ckks_mul_relin_rescale(ctx))
    out = step(a, b, rk_data)
    out.block_until_ready()  # compile + warm

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(a, b, rk_data)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    ops_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "ckks_mul_relin_rescale_n8192_ops_per_s",
                "value": round(ops_per_s, 2),
                "unit": "ciphertext_ops/s",
                "vs_baseline": round(ops_per_s / REF_OPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
