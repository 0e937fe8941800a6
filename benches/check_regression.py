"""Bench regression gate: compare two bench-matrix JSON files, fail on slowdown.

Parity: the reference gates every PR with Bencher `--err`
(.github/workflows/pr_benchmarks.yml:17-32). Here the committed per-round
matrix JSON (benches/recorded/*.json) is the history, and this script is the
gate:

    python benches/check_regression.py --baseline benches/recorded/r01.json \
        --current /tmp/now.json [--threshold 0.20]

exits 1 if any matching cell regressed by more than the threshold.

Committed baselines are CPU-recorded (no chip drift), so absolute seconds
are the default compare. For TPU-vs-TPU runs taken hours apart (±25-30%
chip drift, CLAUDE.md) pass --normalized: every cell is divided by the
run's median hot analytical cell so a uniform chip-speed shift cancels.
Normalization mis-fires whenever a code change moves the normalizer cell
itself, so for absolute A/B of a code change on TPU run both sides in the
same session (`git stash` protocol) and keep the default absolute mode.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_cells(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    cells = doc["results"] if isinstance(doc, dict) and "results" in doc else doc
    return {c["id"]: float(c["seconds"]) for c in cells}


def normalizer(cells: dict) -> float:
    """Median of hot analytical cells — the drift-cancelling reference."""
    import statistics

    hot = [s for i, s in cells.items() if "/hot" in i and "analytical" in i]
    if not hot:
        hot = [s for i, s in cells.items() if "/hot" in i] or list(cells.values())
    return statistics.median(hot)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--current", required=True)
    ap.add_argument("--threshold", type=float, default=0.20,
                    help="max allowed fractional slowdown (default 0.20)")
    # Absolute is the default: the committed baselines are CPU-recorded,
    # where there is no chip drift and raw seconds are the honest compare.
    # --normalized (divide every cell by the run's median hot analytical
    # cell) is for TPU-vs-TPU runs across hours, and mis-fires whenever a
    # code change moves the normalizer cell itself — a uniform genuine
    # improvement is indistinguishable from chip drift under normalization.
    ap.add_argument("--normalized", action="store_true",
                    help="drift-normalize before comparing (TPU runs only)")
    ap.add_argument("--absolute", action="store_true",
                    help="(default) compare raw seconds")
    ap.add_argument("--cold-threshold", type=float, default=None,
                    help="threshold for /cold cells (default: 2x threshold; "
                         "cold cells include one-shot jit dispatch noise)")
    args = ap.parse_args()

    base = load_cells(args.baseline)
    cur = load_cells(args.current)
    if args.normalized:
        nb, nc = normalizer(base), normalizer(cur)
        base = {k: v / nb for k, v in base.items()}
        cur = {k: v / nc for k, v in cur.items()}
        print(f"normalized: baseline ref {nb:.4g}s, current ref {nc:.4g}s "
              f"(chip-speed ratio {nc / nb:.2f}x)")

    cold_thr = args.cold_threshold if args.cold_threshold is not None \
        else 2.0 * args.threshold
    shared = sorted(set(base) & set(cur))
    if not shared:
        print("ERROR: no shared cell ids between baseline and current", file=sys.stderr)
        return 2
    missing = sorted(set(base) - set(cur))
    if missing:
        print(f"note: {len(missing)} baseline cells absent from current run: "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")

    failures = []
    for cid in shared:
        thr = cold_thr if "/cold" in cid else args.threshold
        ratio = cur[cid] / base[cid]
        status = "OK"
        if ratio > 1.0 + thr:
            status = "REGRESSED"
            failures.append((cid, ratio))
        elif ratio < 1.0 - thr:
            status = "improved"
        print(f"  {status:>9}  {ratio:6.2f}x  {cid}")

    if failures:
        print(f"\nFAIL: {len(failures)}/{len(shared)} cells regressed beyond "
              f"{args.threshold:.0%}:")
        for cid, ratio in failures:
            print(f"  {ratio:.2f}x  {cid}")
        return 1
    print(f"\nPASS: {len(shared)} cells within {args.threshold:.0%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
