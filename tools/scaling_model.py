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

Usage: python tools/scaling_model.py   (prints the PERF.md table)
"""

import math

W_EFF = 90e9          # bytes/s effective ring-collective BW per device
T_LAUNCH = 3e-6       # seconds per collective launch/sync

# Measured single-chip anchors (PERF.md round-4 table, batch 128).
# n_ct = first-level ciphertext limb count, nsp = special primes.
CONFIGS = {
    "config 4 (CKKS mul+relin+rescale, N=16384)": dict(
        T1=128.0 / 1166.83, b=128, N=16384, n_ct=5, nsp=1),
    "config 5 (deep CKKS poly4+rot, N=32768)": dict(
        T1=128.0 / 97.47, b=128, N=32768, n_ct=8, nsp=1),
}

GSPMD_KAPPA = 4.4     # fitted: see tests/test_scaling_model.py anchors
CSP_N_TR = 16
CSP_ROWS_PAD = 0.5


def bytes_explicit(b, n_ct, nsp, N, C):
    return b * (n_ct + 2) * N * 8, 2


def bytes_gspmd(b, n_ct, nsp, N, C):
    # dozens of collectives in the measured profiles; 20 is the anchor's
    # order of magnitude (2 all-reduce + 10+ permutes per component)
    return b * GSPMD_KAPPA * (n_ct + nsp) * N * 8, 20


def bytes_csp(b, n_ct, nsp, N, C):
    rows_eff = n_ct + nsp + CSP_ROWS_PAD
    return CSP_N_TR * b * rows_eff * (N / C) * 8, CSP_N_TR


SCHEDULES = {
    "GSPMD (XLA-chosen)": bytes_gspmd,
    "explicit one-gather": bytes_explicit,
    "coeff-sharded (pipeline_csp)": bytes_csp,
}


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
        for sname, fn in SCHEDULES.items():
            effs = [efficiency(cfg, fn, c) for c in chips]
            cells = [
                f"**{e:.0%}**" if e >= 0.80 else f"{e:.0%}" for e in effs
            ]
            print(f"| {cname} | {sname} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
