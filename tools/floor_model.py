"""Per-config floor accounting (VERDICT r4 item 3).

For each BASELINE config this traces the EXACT pipeline bench_all.py times
(same shapes, same builders) with the trace-time counters in
ops/ntt.TRACE_COUNTS and ops/modops.TRACE_MACS enabled, giving the true
per-op work profile of the compiled program:

- poly-limb NTT rows per ciphertext op, split forward/inverse (the
  bandwidth/compute-bound term PERF.md's roofline models), and
- 64x64->128 MAC element counts per op (the key-switch inner product /
  BEHZ base-conversion contractions — the second-largest term).

The modeled floor is then

    t_floor = fwd_rows / rate_fwd(N) + inv_rows / rate_inv(N)
              + macs / rate_mac

with rates measured on the chip (``--measure`` re-runs the microbenches
and prints a fresh RATES block; the committed values below are from the
round-5 run).  Everything else (dyadic products, Galois gathers, where-
chains, reshapes) is deliberately UNMODELED — XLA fuses most of it into
the NTT/MAC loads (PERF.md's config-2' gather finding), so %-of-floor
close to 100 means "the step is NTT+contraction bound and at the machine
floor"; a low % means real unexplained time worth profiling.

Usage:
    python tools/floor_model.py            # trace counts + table (CPU ok)
    python tools/floor_model.py --measure  # re-measure rates on the chip
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# PLACEHOLDER rates pending the on-chip --measure run (N=8192/16384 rows
# from PERF.md's k=2 sweep; 4096/32768 extrapolated; mac_g a guess) —
# replaced by measured values before the PERF.md floor table is written.
RATES = {
    "ntt": {
        # N: (fwd rows/s, inv rows/s)
        4096: (580_193.0, 783_074.0),
        8192: (265_113.0, 367_903.0),
        16384: (82_735.0, 96_411.0),
        32768: (36_512.0, 39_309.0),
    },
    "mac_g": 2.477e9,
}

# bench_all.py round-4 measured ops/s (isolated --only runs, batch 128) —
# PERF.md results table; config 2 row is the sequential rotate.
MEASURED_OPS = {
    "1": 7704.0,
    "2": 4919.0,
    "3": 1278.0,
    "4": 1167.0,
    "4p": 6902.0,
    "5": 97.5,
}

BATCH = 128


def _emit_rates():
    """Measure NTT rows/s per N and the MAC rate on the current backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemini_seal_tpu.modulus import CoeffModulus
    from gemini_seal_tpu.ops import modops, ntt
    from gemini_seal_tpu.ops.dyadic import LimbConstants

    def checksum_jit(fn):
        return jax.jit(lambda salt, *a: jnp.sum(fn(*a), dtype=jnp.uint64) + salt)

    def sync_time(step, args, units):
        x = step(np.uint64(0), *args)
        int(x)
        t0 = time.perf_counter()
        for i in range(3):
            x = step(np.uint64(i), *args)
        int(x)
        per = (time.perf_counter() - t0) / 3
        iters = max(5, min(300, int(2.0 / max(per, 1e-6))))
        t0 = time.perf_counter()
        for i in range(iters):
            x = step(np.uint64(i), *args)
        int(x)
        return units * iters / (time.perf_counter() - t0)

    out = {"ntt": {}}
    rng = np.random.default_rng(0)
    for n, bits in [(4096, [36, 36, 37]), (8192, [50, 40, 40, 50]),
                    (16384, [50, 40, 40, 40, 40, 50]),
                    (32768, [59, 40, 40, 40, 40, 40, 40, 59])]:
        logn = n.bit_length() - 1
        mods = CoeffModulus.create(n, bits)
        L = len(mods)
        tabs = ntt.build_ntt_tables(logn, mods)
        # batch 128 lanes at EVERY N (the config benches run batch-128
        # ciphertexts; shrinking b with N under-amortizes the big-N rows
        # and under-states the floor — configs 4/5 measured >100% of the
        # first model for exactly this reason)
        b = BATCH
        x = np.stack(
            [rng.integers(0, m.value, (b, 2, n), dtype=np.uint64) for m in mods],
            axis=2)
        dx = jax.device_put(x)
        rows = b * 2 * L
        fwd = sync_time(checksum_jit(lambda y: ntt.ntt_forward(y, tabs)),
                        (dx,), rows)
        inv = sync_time(checksum_jit(lambda y: ntt.ntt_inverse(y, tabs)),
                        (dx,), rows)
        out["ntt"][n] = (round(fwd, 0), round(inv, 0))
        print(f"  N={n}: fwd {fwd:,.0f} rows/s, inv {inv:,.0f} rows/s",
              flush=True)

    # MAC rate at a key-switch-shaped contraction: [B, nb, O, N] x [O, nb]
    n, nb, O, b = 8192, 2, 6, 32
    mods = CoeffModulus.create(n, [50, 40, 40, 40, 50, 59])
    lc = LimbConstants.from_moduli(mods[:O])
    a = rng.integers(0, 1 << 50, (b, nb, O, n), dtype=np.uint64)
    w = rng.integers(0, 1 << 50, (O, nb), dtype=np.uint64)
    da, dw = jax.device_put(a), jax.device_put(w)

    def contract(x, k):
        return modops.accumulate_mulmod_128(
            ((x[:, i], k[:, i, None]) for i in range(nb)),
            lc.p, lc.ratio0, lc.ratio1)

    macs = b * nb * O * n
    rate = sync_time(checksum_jit(contract), (da, dw), macs)
    out["mac_g"] = rate
    print(f"  MAC rate: {rate / 1e9:.3f} G MAC/s", flush=True)
    print("RATES =", json.dumps(out))
    return out


def _trace(fn, *args):
    """eval_shape fn(*args) with the counters on; return per-trace totals."""
    import jax

    from gemini_seal_tpu.ops import modops, ntt

    ntt.TRACE_COUNTS = []
    modops.TRACE_MACS = []
    try:
        jax.eval_shape(fn, *args)
        counts = {}
        for kind, rows, n in ntt.TRACE_COUNTS:
            counts[(kind, n)] = counts.get((kind, n), 0) + rows
        macs = sum(modops.TRACE_MACS)
    finally:
        ntt.TRACE_COUNTS = None
        modops.TRACE_MACS = None
    return counts, macs


def trace_configs(keys):
    """Build each bench_all config's pipeline and trace its work profile.

    Returns {key: {"n": N, "ops": ops/call, "fwd": rows, "inv": rows,
    "macs": elements}} — rows/macs are per CALL; divide by "ops" for
    per-ciphertext-op numbers.
    """
    import numpy as np

    from gemini_seal_tpu import (
        BatchEncoder, CKKSEncoder, CoeffModulus, EncryptionParameters,
        Encryptor, KeyGenerator, PlainModulus, SchemeType, SecLevelType,
        SealContext,
    )
    from gemini_seal_tpu.models.pipelines import (
        build_bfv_mul_relin, build_bfv_mul_relin_modswitch,
        build_ckks_mul_relin_rescale, build_ckks_poly_eval,
    )

    out = {}

    def ct_shape(ctx):
        cd = ctx.first_context_data()
        L = len(cd.parms.coeff_modulus)
        return (2, L, cd.parms.poly_modulus_degree)

    def zeros(shape):
        return np.zeros(shape, dtype=np.uint64)

    if "1" in keys:
        n = 4096
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        parms.set_random_seed(tuple(range(8)))
        ctx = SealContext(parms, sec_level=SecLevelType.tc128)
        kg = KeyGenerator(ctx)
        rk = kg.relin_keys()
        rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
        fn = build_bfv_mul_relin(ctx)
        x = zeros((BATCH,) + ct_shape(ctx))
        counts, macs = _trace(lambda a, k: fn(a, a, k), x, rk_data)
        out["1"] = {"n": n, "ops": BATCH, "counts": counts, "macs": macs}

    if "2" in keys:
        import jax.numpy as jnp

        from gemini_seal_tpu.ops.dyadic import add_poly
        from gemini_seal_tpu.ops.keyswitch import KeySwitchPlan, switch_key
        n = 8192
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        parms.set_random_seed(tuple(range(8)))
        ctx = SealContext(parms, sec_level=SecLevelType.tc128)
        kg = KeyGenerator(ctx)
        tool = ctx.first_context_data().galois_tool
        elt = tool.get_elt_from_step(1)
        gk = kg.galois_keys([elt])
        plan = KeySwitchPlan(ctx, ctx.first_parms_id)
        limbs = ctx.first_context_data().limb_constants
        gk_data = np.stack([np.asarray(pk.data.data) for pk in gk.key(elt)])

        def bfv_rotate(x, k):
            c0 = tool.apply_galois(x[..., 0, :, :], elt, limbs)
            c1 = tool.apply_galois(x[..., 1, :, :], elt, limbs)
            d0, d1 = switch_key(c1, k, plan, False)
            return jnp.stack([add_poly(c0, d0, limbs), d1], axis=-3)

        x = zeros((BATCH,) + ct_shape(ctx))
        counts, macs = _trace(bfv_rotate, x, gk_data)
        out["2"] = {"n": n, "ops": BATCH, "counts": counts, "macs": macs}

    if "3" in keys:
        n = 8192
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, [50, 40, 40, 40, 50]))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        parms.set_random_seed(tuple(range(8)))
        ctx = SealContext(parms, sec_level=SecLevelType.none)
        kg = KeyGenerator(ctx)
        rk = kg.relin_keys()
        rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
        fn = build_bfv_mul_relin_modswitch(ctx, fused_drop=True)
        x = zeros((BATCH,) + ct_shape(ctx))
        counts, macs = _trace(lambda a, k: fn(a, a, k), x, rk_data)
        out["3"] = {"n": n, "ops": BATCH, "counts": counts, "macs": macs}

    for key, n, bits in [("4", 16384, [50, 40, 40, 40, 40, 50]),
                         ("4p", 8192, [50, 40, 40, 50])]:
        if key not in keys:
            continue
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, bits))
        parms.set_random_seed(tuple(range(8)))
        ctx = SealContext(parms, sec_level=SecLevelType.none)
        kg = KeyGenerator(ctx)
        rk = kg.relin_keys()
        rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
        fn = build_ckks_mul_relin_rescale(ctx)
        x = zeros((BATCH,) + ct_shape(ctx))
        counts, macs = _trace(lambda a, k: fn(a, a, k), x, rk_data)
        out[key] = {"n": n, "ops": BATCH, "counts": counts, "macs": macs}

    if "5" in keys:
        n = 32768
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(
            CoeffModulus.create(n, [59, 40, 40, 40, 40, 40, 40, 59]))
        parms.set_random_seed(tuple(range(8)))
        ctx = SealContext(parms, sec_level=SecLevelType.none)
        kg = KeyGenerator(ctx)
        encoder = CKKSEncoder(ctx)
        tool = ctx.first_context_data().galois_tool
        rk = kg.relin_keys()
        elts = [tool.get_elt_from_step(s_) for s_ in (1, 2, 3)]
        gk = kg.galois_keys(elts)
        stepfn, _, _ = build_ckks_poly_eval(
            ctx, [1.0, -0.5, 0.25, 0.125, 0.0625], 2.0 ** 40, encoder,
            rotate_sum_log2=2, coeff_precision_bits=25, composed=True,
            rotate_mode="flat")
        rk_data = np.stack([np.asarray(pk.data.data) for pk in rk.key(2)])
        gk_stack = np.stack([
            np.stack([np.asarray(pk.data.data) for pk in gk.key(e)])
            for e in elts])
        x = zeros((BATCH,) + ct_shape(ctx))
        counts, macs = _trace(stepfn, x, rk_data, gk_stack)
        out["5"] = {"n": n, "ops": BATCH, "counts": counts, "macs": macs}

    return out


def floor_table(profiles, rates=RATES, measured=MEASURED_OPS):
    rows = []
    for key, p in sorted(profiles.items()):
        ops = p["ops"]
        t = 0.0
        fwd_rows = inv_rows = 0
        for (kind, n), r in sorted(p["counts"].items()):
            fr, ir = rates["ntt"][n]
            t += r / (fr if kind == "fwd" else ir)
            if kind == "fwd":
                fwd_rows += r
            else:
                inv_rows += r
        t_mac = p["macs"] / rates["mac_g"]
        t_total = (t + t_mac) / ops
        floor = 1.0 / t_total
        meas = measured.get(key)
        rows.append({
            "config": key, "n": p["n"],
            "fwd_rows_per_op": round(fwd_rows / ops, 2),
            "inv_rows_per_op": round(inv_rows / ops, 2),
            "gmac_per_op": round(p["macs"] / ops / 1e9, 4),
            "t_ntt_us": round(t / ops * 1e6, 1),
            "t_mac_us": round(t_mac / ops * 1e6, 1),
            "floor_ops_s": round(floor, 1),
            "measured_ops_s": meas,
            "pct_of_floor": round(100.0 * meas / floor, 1) if meas else None,
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="re-measure NTT/MAC rates on the current backend")
    ap.add_argument("--only", default="1,2,3,4,4p,5")
    cfg = ap.parse_args()

    if not cfg.measure:
        # tracing never executes — force CPU so this runs anywhere
        import jax
        jax.config.update("jax_platforms", "cpu")

    rates = RATES
    if cfg.measure:
        rates = _emit_rates()

    keys = set(cfg.only.split(","))
    profiles = trace_configs(keys)
    for row in floor_table(profiles, rates):
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
