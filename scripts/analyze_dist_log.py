"""Summarize per-view dist-loss from a run's train_stats.csv.

DTU-mesh recipe diagnostics (ROUND4.md task 4): attributes lambda_dist
spikes to specific training views. Prints per-view mean/max dist over a
trailing window plus the global worst spikes.
"""
from __future__ import annotations
import argparse
import csv
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats_csv")
    ap.add_argument("--after", type=int, default=3000,
                    help="ignore iterations before the dist gate")
    args = ap.parse_args()

    rows = []
    with open(args.stats_csv) as f:
        for r in csv.DictReader(f):
            it = int(r["iteration"])
            if it <= args.after or not r.get("dist_loss"):
                continue
            view = int(float(r["view"]))
            if view < 0:
                # DP runs log view=-1 (the dist value is a pmean across the
                # step's views — per-view attribution is meaningless there)
                continue
            rows.append((it, view, float(r["dist_loss"])))
    if not rows:
        print("no post-gate rows")
        return

    per_view = defaultdict(list)
    for it, v, d in rows:
        per_view[v].append(d)
    print(f"{len(rows)} logged steps, {len(per_view)} views, "
          f"iters {rows[0][0]}..{rows[-1][0]}")
    print(f"{'view':>5} {'n':>4} {'mean':>10} {'max':>10}")
    flagged = []
    global_mean = sum(d for _, _, d in rows) / len(rows)
    for v in sorted(per_view):
        ds = per_view[v]
        m, mx = sum(ds) / len(ds), max(ds)
        mark = ""
        if mx > 5 * global_mean:
            mark = "  <-- spike"
            flagged.append(v)
        print(f"{v:>5} {len(ds):>4} {m:>10.4f} {mx:>10.4f}{mark}")
    print(f"global mean {global_mean:.4f}; spiking views: {flagged}")
    worst = sorted(rows, key=lambda t: -t[2])[:10]
    print("worst steps (iter, view, dist):")
    for it, v, d in worst:
        print(f"  {it:>6} view {v:>3}  {d:.4f}")


if __name__ == "__main__":
    main()
