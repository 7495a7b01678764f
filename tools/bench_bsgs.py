"""Measure flat-hoisted vs BSGS encrypted matvec at large diagonal counts.

The flat hoisted matvec (build_ckks_matvec) pays one key-switch inner
product + digit Galois gather per diagonal; BSGS (build_ckks_matvec_bsgs)
pays ~2*sqrt(k) inner products but G extra mod-up/mod-down passes.  This
tool measures the crossover on the real chip (VERDICT r2 wants levers
measured, not estimated — same rule as the MXU NTT verdict).

Usage: python tools/bench_bsgs.py [--batch 16] [--dims 16,32,64] [--small]
One JSON line per (dim, variant).
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--dims", default="16,32,64")
    ap.add_argument("--small", action="store_true")
    cfg = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemini_seal_tpu import (CKKSEncoder, CoeffModulus,
                                 EncryptionParameters, Encryptor,
                                 KeyGenerator, SchemeType, SecLevelType,
                                 SealContext)
    from gemini_seal_tpu.models.pipelines import (build_ckks_matvec,
                                                  build_ckks_matvec_bsgs)

    n = 1024 if cfg.small else 8192
    bits = [40, 30, 40] if cfg.small else [50, 40, 40, 50]
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_random_seed(tuple(range(8)))
    ctx = SealContext(parms, sec_level=SecLevelType.none)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg.public_key())
    encoder = CKKSEncoder(ctx)
    tool = ctx.first_context_data().galois_tool
    slots = encoder.slot_count
    rng = np.random.default_rng(1)

    def checksum_jit(fn):
        return jax.jit(
            lambda salt, *a: jnp.sum(fn(*a), dtype=jnp.uint64) + salt
        )

    def sync_time(step, args, batch, iters):
        x = step(np.uint64(0), *args)
        int(x)
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
        return batch * iters / (time.perf_counter() - t0)

    x = enc.encrypt(encoder.encode([0.5] * slots, 2.0 ** 40))
    a = np.broadcast_to(np.asarray(x.data), (cfg.batch,) + x.data.shape)
    da = jax.device_put(a)

    for dim in (int(d) for d in cfg.dims.split(",")):
        M = rng.uniform(-0.5, 0.5, size=(dim, dim))
        diagonals = {
            d: [M[i % dim, (i + d) % dim] for i in range(slots)]
            for d in range(dim)
        }

        flat_steps = sorted(s for s in diagonals if s != 0)
        flat_elts = [tool.get_elt_from_step(s) for s in flat_steps]
        gkf = kg.galois_keys(flat_elts)
        step = checksum_jit(
            build_ckks_matvec(ctx, diagonals, 2.0 ** 40, encoder))
        dk = jax.device_put(gkf.stacked(*flat_elts))
        flat = sync_time(lambda s, c, k: step(s, c, k), (da, dk),
                         cfg.batch, cfg.iters)
        print(json.dumps({"metric": f"matvec{dim}_flat_n{n}",
                          "value": round(flat, 2), "unit": "matvecs/s",
                          "rotations": len(flat_steps)}), flush=True)

        fn, rot_steps = build_ckks_matvec_bsgs(
            ctx, diagonals, 2.0 ** 40, encoder)
        elts = [tool.get_elt_from_step(s) for s in rot_steps]
        gkb = kg.galois_keys(elts)
        stepb = checksum_jit(fn)
        dkb = jax.device_put(gkb.stacked(*elts))
        bsgs = sync_time(lambda s, c, k: stepb(s, c, k), (da, dkb),
                         cfg.batch, cfg.iters)
        print(json.dumps({"metric": f"matvec{dim}_bsgs_n{n}",
                          "value": round(bsgs, 2), "unit": "matvecs/s",
                          "rotations": len(rot_steps),
                          "vs_flat": round(bsgs / flat, 3)}), flush=True)


if __name__ == "__main__":
    main()
