"""Round-over-round bench regression tracking (VERDICT r04 weak #1).

Reads every driver-captured BENCH_r*.json at the repo root and prints the
headline series plus deltas for the key extras, so regressions (like the
r03→r04 9% headline drop that went unattributed) are visible at a glance.

Run:  python tools/bench_history.py

NOTE on cross-round comparability: r01–r04 benched at T=200, where the
axon tunnel's flat ~25-30 ms RTT was ~half of every wall measurement
(profiler-traced in r05); r05+ benches at T=2000. The r05 jump therefore
combines real kernel work (incremental assembly caches, EKF-stage kernel:
+29% at matched T) with honest measurement (RTT amortization: ~2x).
"""

from __future__ import annotations

import glob
import json
import os
import sys

KEYS = [
    ("value", "headline ticks/s"),
    ("mhe_only_megakernel_solves_per_s", "MHE-only mega"),
    ("mhe_only_scan_solves_per_s", "MHE-only scan"),
    ("constrained_pallas_solves_per_s", "constrained (standalone ADMM)"),
    ("constrained_megakernel_solves_per_s", "constrained mega"),
    ("constrained_pipeline_ticks_per_s", "constrained pipeline"),
    ("fleet_rmse_vs_gt", "fleet RMSE"),
    ("rmse_delta_f32_vs_f64", "f32 gate delta"),
]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                d = json.load(fh)
        except Exception as e:
            print(f"{os.path.basename(path)}: unreadable ({e})",
                  file=sys.stderr)
            continue
        # driver artifacts wrap the bench JSON line under "parsed"
        parsed = d.get("parsed", d)
        rounds.append((os.path.basename(path), parsed))
    if not rounds:
        print("no BENCH_r*.json artifacts found", file=sys.stderr)
        return 1
    for key, label in KEYS:
        row = []
        prev = None
        for name, d in rounds:
            v = d.get(key)
            if v is None:
                row.append(f"{name[6:9]}: -")
                continue
            delta = ""
            if prev not in (None, 0) and isinstance(v, (int, float)):
                delta = f" ({100.0 * (v - prev) / prev:+.0f}%)"
            row.append(f"{name[6:9]}: {v:,.6g}{delta}")
            prev = v if isinstance(v, (int, float)) else prev
        print(f"{label:32s} " + " | ".join(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
