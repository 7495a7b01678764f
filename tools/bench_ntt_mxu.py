"""Measure the MXU four-step digit-matmul NTT against the radix-2
butterfly NTT on the real TPU (VERDICT r2 item 1).

Prints poly-limb NTTs/s for both, at the config-4 shape (N=16384,
L=6 {50,40,40,40,40,50}) and the headline shape (N=8192, L=4).
Honest-measurement rules from bench.py: checksum-returning jitted step,
single fetch drains the in-order stream.
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


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
    cfg = ap.parse_args()

    if cfg.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemini_seal_tpu.modulus import CoeffModulus
    from gemini_seal_tpu.ops import ntt, ntt_mxu

    print("devices:", jax.devices())

    def checksum_jit(fn):
        return jax.jit(lambda salt, *a: jnp.sum(fn(*a), dtype=jnp.uint64) + salt)

    for n, bits in [(16384, [50, 40, 40, 40, 40, 50]), (8192, [50, 40, 40, 50])]:
        logn = n.bit_length() - 1
        mods = CoeffModulus.create(n, bits)
        L = len(mods)
        tabs = ntt.build_ntt_tables(logn, mods)
        mx = ntt_mxu.build_mxu_ntt_tables(logn, mods)
        rng = np.random.default_rng(0)
        x = np.stack(
            [rng.integers(0, m.value, (cfg.batch, 2, n), dtype=np.uint64)
             for m in mods], axis=2,
        )  # [B, 2, L, N]
        dx = jax.device_put(x)
        nttsteps = cfg.batch * 2 * L

        r2 = checksum_jit(lambda v: ntt.ntt_forward(v, tabs))
        per_r2 = _sync_time(lambda s, v: r2(s, v), (dx,), nttsteps, cfg.iters)
        print(f"N={n} radix-2 forward: {per_r2:,.0f} poly-limb NTTs/s")

        mxs = checksum_jit(lambda v: ntt_mxu.ntt_forward_mxu(v, mx))
        per_mx = _sync_time(lambda s, v: mxs(s, v), (dx,), nttsteps, cfg.iters)
        print(f"N={n} MXU four-step forward: {per_mx:,.0f} poly-limb NTTs/s "
              f"({per_mx / per_r2:.2f}x radix-2)")

        r2i = checksum_jit(lambda v: ntt.ntt_inverse(v, tabs))
        per_r2i = _sync_time(lambda s, v: r2i(s, v), (dx,), nttsteps, cfg.iters)
        print(f"N={n} radix-2 inverse: {per_r2i:,.0f} poly-limb NTTs/s")

        mxi = checksum_jit(lambda v: ntt_mxu.ntt_inverse_mxu(v, mx))
        per_mxi = _sync_time(lambda s, v: mxi(s, v), (dx,), nttsteps, cfg.iters)
        print(f"N={n} MXU four-step inverse: {per_mxi:,.0f} poly-limb NTTs/s "
              f"({per_mxi / per_r2i:.2f}x radix-2)")


if __name__ == "__main__":
    main()
