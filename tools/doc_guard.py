"""Doc-coherence guard (VERDICT r4 item 8): the README headline numbers
must match PERF.md's results table so stale figures can't recur.

Checks:
1. the five-config range README quotes ("A-Bx across ... BASELINE
   configs") equals the min/max of the **Nx** multipliers in PERF.md's
   numbered results-table rows (configs 1-5);
2. the README headline multiplier ("Mx the reference C++") appears in
   PERF.md's 4' (bench.py headline) row within one re-run tick (0.1).

Exit 0 silent on success; exit 1 with a diff on drift.
"""

import re
import sys


def main():
    readme = open("README.md").read()
    perf = open("PERF.md").read()

    # PERF results table: numbered config rows "| 1 | ... | **103×** | ..."
    mults = [
        float(m)
        for row, m in re.findall(
            r"^\| (\d) \|.*\*\*([\d.]+)×\*\*", perf, re.M)
    ]
    if len(mults) < 5:
        print(f"doc_guard: found only {len(mults)} multiplier rows in "
              "PERF.md results table", file=sys.stderr)
        return 1
    lo, hi = min(mults), max(mults)

    m = re.search(r"([\d.]+)-([\d.]+)x across\s+all five BASELINE", readme)
    if not m:
        print("doc_guard: README five-config range sentence not found",
              file=sys.stderr)
        return 1
    rlo, rhi = float(m.group(1)), float(m.group(2))
    if abs(rlo - lo) > 1.0 or abs(rhi - hi) > 1.0:
        print(f"doc_guard: README range {rlo}-{rhi}x != PERF table "
              f"{lo}-{hi}x", file=sys.stderr)
        return 1

    mh = re.search(r"\(([\d.]+)x the\s+reference C\+\+", readme)
    mp = re.search(r"bench\.py headline[^|]*\|[^|]*\|[^|]*\| "
                   r"\*\*([\d.]+)×\*\*", perf)
    if not (mh and mp):
        print("doc_guard: headline multiplier not found in README or PERF",
              file=sys.stderr)
        return 1
    if abs(float(mh.group(1)) - float(mp.group(1))) > 0.15:
        print(f"doc_guard: README headline {mh.group(1)}x vs PERF 4' row "
              f"{mp.group(1)}x", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
