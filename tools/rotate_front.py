"""Compute the next round's driver sweep front.

The external driver's correctness sweep samples the FIRST 50 registry
entries each round; `plans/__init__._SWEEP_FRONT` rotates
stalest-evidence queries forward so every query accumulates a fresh
driver row within a few rounds. This tool derives that ordering from
the recorded CORRECTNESS_r*.json artifacts: queries with NO driver row
yet come first (new registrations), then ascending newest-round, then
name order. It PRINTS the suggested front — paste it into
`plans/__init__.py`; nothing is modified.

Usage: python tools/rotate_front.py [n_front=50]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_analyze_data_stream_processing_spark.plans import QUERIES


def main() -> None:
    n_front = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, row in json.load(f).items():
                # Only a clean row counts as evidence: a query that FAILED in
                # the latest round must rotate forward for re-sampling, not
                # to the back of the front.
                if row.get("err") is not None or not row.get("hash_match", False):
                    continue
                latest[name] = max(latest.get(name, 0), rnd)
    ranked = sorted(QUERIES, key=lambda n: (latest.get(n, -1), n))
    print(f"# suggested _SWEEP_FRONT (driver samples first {n_front}):")
    print("_SWEEP_FRONT = [")
    last: object = ...
    for name in ranked[:n_front]:
        ev = latest.get(name)
        if ev != last:
            print(f"    # newest driver evidence: {'none' if ev is None else f'r{ev:02d}'}")
            last = ev
        print(f'    "{name}",')
    print("]")
    uncovered = [n for n in ranked[n_front:] if latest.get(n) is None]
    if uncovered:
        print(f"# WARNING: {len(uncovered)} never-sampled queries did not fit "
              f"in the front: {uncovered}")


if __name__ == "__main__":
    main()
