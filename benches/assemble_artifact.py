"""Assemble a round artifact from a bench script's stdout JSON lines.

The bench harnesses (roofline.py, run_benches.py, tpu_tests.py,
weak_scaling.py) print one JSON object per line; the committed round
artifacts (ROOFLINE_r{N}.json, BENCHES_r{N}.json, ...) wrap those lines as
``{"round": N, "harness": ..., "metrics": [...]}``.  This script does that
wrapping so artifact regeneration is one documented command, e.g.:

    python benches/roofline.py | python benches/assemble_artifact.py \
        --round 4 --harness benches/roofline.py --out ROOFLINE_r04.json

Non-JSON lines (jax platform warnings) are ignored.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--harness", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--extra", default=None,
                    help="JSON object merged into the artifact top level")
    args = ap.parse_args()

    metrics = []
    for line in sys.stdin:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            metrics.append(json.loads(line))
        except json.JSONDecodeError:
            continue

    artifact = {"round": args.round, "harness": args.harness,
                "metrics": metrics}
    if args.extra:
        artifact.update(json.loads(args.extra))
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out} ({len(metrics)} metrics)")


if __name__ == "__main__":
    main()
