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

Synchronization: jax's block_until_ready is a no-op through the remote-TPU
tunnel, so the jitted step returns a uint64 full-tensor checksum (forcing
every output element to be computed — no dead-code elimination) and the
timing loop fetches only the final checksum; TPU streams execute in order,
so its readiness implies all enqueued steps completed.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import time

# Persistent compilation cache (first compile through the remote tunnel is
# expensive; later runs hit the disk cache).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REF_OPS_PER_S = 1e6 / 5983.7  # reference C++ on this host (see docstring)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    batch = int(os.environ.get("BENCH_BATCH", "128"))  # measured sweet spot
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
    rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])

    a = np.broadcast_to(np.asarray(ct.data), (batch,) + ct.data.shape)

    # fused=True merges the rescale into the key-switch mod-down: decrypts
    # EQUAL but is not bit-identical to the sequential oracle-pinned path
    # (single rounding by P*q_last; see ops.keyswitch.fused_moddown and the
    # decrypt-equality regression test_pipelines.test_fused_rescale_decrypts
    # _equal, which pins this exact bench configuration)
    inner = build_ckks_mul_relin_rescale(ctx, fused=True)
    # checksum-returning step: the uint64 full-sum depends on every output
    # element; the salt makes each enqueued call distinct.
    step = jax.jit(
        lambda a, b, k, salt: jnp.sum(inner(a, b, k), dtype=jnp.uint64) + salt
    )
    dev_a = jax.device_put(a)
    dev_rk = jax.device_put(rk_data)
    int(step(dev_a, dev_a, dev_rk, np.uint64(0)))  # compile + warm + sync

    # calibrate iteration count to ~3s of steady-state work
    iters = int(os.environ.get("BENCH_ITERS", "0"))
    if not iters:
        t0 = time.perf_counter()
        for i in range(5):
            x = step(dev_a, dev_a, dev_rk, np.uint64(i))
        int(x)
        per = (time.perf_counter() - t0) / 5
        iters = max(10, min(2000, int(3.0 / max(per, 1e-6))))

    t0 = time.perf_counter()
    for i in range(iters):
        x = step(dev_a, dev_a, dev_rk, np.uint64(i))
    checksum = int(x)  # single fetch drains the in-order stream
    dt = time.perf_counter() - t0
    assert checksum != 0

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
