"""Predicted multi-chip scaling efficiency (BASELINE.md's >=80% target).

Real multi-chip hardware is unreachable from this environment, so the
completable form of BASELINE's "ops/s scaling efficiency >= 80% from
1 chip to >= 2 hosts" deliverable is a FALSIFIABLE PREDICTION: combine

  (a) the measured single-chip step time of each config (PERF.md
      round-4 table, checksum-sync timing on the real v5e-class chip),
  (b) the per-device ICI byte volume of each schedule as a function of
      chip count — analytic formulas anchored to and guarded against
      the GSPMD-partitioned HLO byte counts (parallel/comm.py;
      tests/test_scaling_model.py pins formula == HLO at the
      virtual-mesh-measurable shape so the model cannot silently drift
      from the shipped code), and
  (c) v5e interconnect numbers: ICI ~45 GB/s/link/direction, ring
      collectives ride 2 links -> W_eff ~ 90 GB/s per device;
      per-collective launch/sync latency assumed 3 us.

Model (conservative: NO compute/comm overlap):

  T(C)   = T_1/C + bytes_per_device(C)/W_eff + n_collectives * t_launch
  eff(C) = T_1 / (C * T(C))          # per-chip throughput vs 1 chip

This is strong scaling of the latency slice (limb or coeff axis).  The
production layout puts a dp axis ON TOP: dp moves ZERO ICI bytes
(tests/test_parallel_guards.py pins this), so dp multiplies throughput
at 100% efficiency and the table below is the worst case — a (dp x
limb) mesh at C chips inherits the limb slice's efficiency only.

Byte formulas per schedule (per device per step; b = ciphertext batch
per latency slice, n_ct/L/nsp/N from the config's chain):

- explicit one-gather (parallel/keyswitch_sp.py):
    bytes = b * (n_ct + 2) * N * 8, 2 collectives
  (ONE all-gather of the power-basis target + ONE q_last all-reduce —
  PERF.md comm table row 1280 KiB at b=4, n_ct=8, N=4096: exact match.)
  Independent of C: the gathered target is the whole tensor.

- GSPMD (XLA-chosen partitioning of the in-core step):
    bytes ~= b * kappa * (L + nsp) * N * 8, kappa fitted at the two
  measured anchors ((dp2,limb4): 5632 KiB at b=4; (1,8): 11008 KiB at
  b=8 -> kappa ~ 4.3-4.4 per (L+nsp) row) — GSPMD's gathered digit /
  permuted accumulator traffic does not shrink with C.

- coefficient-sharded (parallel/pipeline_csp.py):
    bytes = n_tr * b * rows_eff * (N / C) * 8,  n_tr = 16 transposes,
  rows_eff ~= L + nsp + 0.5 (fitted: 10.5 at the L=8+2sp anchor where
  the HLO measures 10752 KiB at C=4, b=8, N=4096).  Counting follows
  comm.py's convention (all_to_all RESULT bytes; wire bytes are
  (C-1)/C of that).  Shrinks as 1/C — the deep-N layout.

- BEHZ five-gather (parallel/behz_sp.py, the BFV configs):
    bytes = 11 * b * n_ct * N * 8, 5 collectives
  (2 operand extends of [b, 2, n_ct, N] + fast_floor and fastbconv_sk
  gathers of [b, 3, n_ct, N] + the relin target [b, n_ct, N]: 11
  polynomial planes — tests/test_scaling_model.py pins formula == HLO
  exactly).  Independent of C; feasible for C dividing n_ct (= n_B).

- GSPMD-BFV (XLA partitioning of build_bfv_mul_relin):
    bytes ~= b * kappa_bfv * (n_ct + nsp) * N * 8, kappa_bfv ~ 9.0
  fitted at the PERF.md anchor (10.1 MiB at N=2048, n_ct=8, nsp=1,
  b=8, limb=4) and guarded within 25% by test_scaling_model.py.

Limb sharding (explicit or GSPMD) is capped at C = n_ct for BFV — the
table prints n/a beyond it; a dp axis extends total chips at 100%
efficiency past that point (zero-ICI, pinned by
tests/test_parallel_guards.py).

Usage: python tools/scaling_model.py   (prints the PERF.md table)
"""

import math

W_EFF = 90e9          # bytes/s effective ring-collective BW per device
T_LAUNCH = 3e-6       # seconds per collective launch/sync

# Measured single-chip anchors (PERF.md round-4 table, batch 128).
# n_ct = first-level ciphertext limb count, nsp = special primes.
# "schedules" names the rows printed for the config; "max_limb" caps the
# feasible limb-shard width (n/a beyond — dp extends at 100%).
CONFIGS = {
    "config 1 (BFV mul+relin, N=4096)": dict(
        T1=128.0 / 7704.0, b=128, N=4096, n_ct=2, nsp=1,
        schedules=("GSPMD-BFV (XLA-chosen)", "BEHZ five-gather (behz_sp)"),
        max_limb=2),
    "config 2 (BFV rotate_rows, N=8192)": dict(
        T1=128.0 / 4919.0, b=128, N=8192, n_ct=4, nsp=1,
        schedules=("GSPMD-BFV (XLA-chosen)", "explicit one-gather"),
        max_limb=4),
    "config 3 (BFV mul+relin+chain, N=8192)": dict(
        T1=128.0 / 1278.0, b=128, N=8192, n_ct=4, nsp=1,
        schedules=("GSPMD-BFV (XLA-chosen)", "BEHZ five-gather (behz_sp)"),
        max_limb=4),
    "config 4 (CKKS mul+relin+rescale, N=16384)": dict(
        T1=128.0 / 1166.83, b=128, N=16384, n_ct=5, nsp=1),
    "config 5 (deep CKKS poly4+rot, N=32768)": dict(
        T1=128.0 / 97.47, b=128, N=32768, n_ct=8, nsp=1),
}

GSPMD_KAPPA = 4.4     # fitted: see tests/test_scaling_model.py anchors
GSPMD_KAPPA_BFV = 9.0  # fitted at the behz GSPMD anchor (PERF.md 10.1 MiB)
CSP_N_TR = 16
CSP_ROWS_PAD = 0.5


def bytes_explicit(b, n_ct, nsp, N, C):
    return b * (n_ct + 2) * N * 8, 2


def bytes_gspmd(b, n_ct, nsp, N, C):
    # dozens of collectives in the measured profiles; 20 is the anchor's
    # order of magnitude (2 all-reduce + 10+ permutes per component)
    return b * GSPMD_KAPPA * (n_ct + nsp) * N * 8, 20


def bytes_gspmd_bfv(b, n_ct, nsp, N, C):
    # the BEHZ step's gathered extension traffic: 1 all-reduce + ~42
    # collective-permutes in the measured profile
    return b * GSPMD_KAPPA_BFV * (n_ct + nsp) * N * 8, 43


def bytes_csp(b, n_ct, nsp, N, C):
    rows_eff = n_ct + nsp + CSP_ROWS_PAD
    return CSP_N_TR * b * rows_eff * (N / C) * 8, CSP_N_TR


def bytes_behz(b, n_ct, nsp, N, C):
    # 5 tiled all-gathers totalling 11 polynomial planes of [b, n_ct, N]:
    # 2 operand extends (2 planes each), fast_floor + fastbconv_sk
    # (3 planes each: the size-3 convolution output), relin target (1)
    return 11 * b * n_ct * N * 8, 5


SCHEDULES = {
    "GSPMD (XLA-chosen)": bytes_gspmd,
    "explicit one-gather": bytes_explicit,
    "coeff-sharded (pipeline_csp)": bytes_csp,
    "GSPMD-BFV (XLA-chosen)": bytes_gspmd_bfv,
    "BEHZ five-gather (behz_sp)": bytes_behz,
}

# rows printed for configs that don't name their own schedule set
DEFAULT_SCHEDULES = (
    "GSPMD (XLA-chosen)", "explicit one-gather",
    "coeff-sharded (pipeline_csp)",
)


def efficiency(cfg, sched_fn, C):
    if C == 1:
        return 1.0
    byts, n_coll = sched_fn(cfg["b"], cfg["n_ct"], cfg["nsp"],
                            cfg["N"], C)
    t_comm = byts / W_EFF + n_coll * T_LAUNCH
    T1 = cfg["T1"]
    return T1 / (C * (T1 / C + t_comm))


def main():
    chips = [1, 2, 4, 8]
    print("| Config | Schedule | " +
          " | ".join(f"eff @ {c} chips" for c in chips) + " |")
    print("|---|---|" + "---|" * len(chips))
    for cname, cfg in CONFIGS.items():
        max_limb = cfg.get("max_limb", max(chips))
        for sname in cfg.get("schedules", DEFAULT_SCHEDULES):
            fn = SCHEDULES[sname]
            cells = []
            for c in chips:
                if c > max_limb:
                    cells.append("n/a (dp)")
                    continue
                e = efficiency(cfg, fn, c)
                cells.append(f"**{e:.0%}**" if e >= 0.80 else f"{e:.0%}")
            print(f"| {cname} | {sname} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
