#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule): run bench.py at
local[N] and local[4N] on the SAME input, report throughput at both and
the scaling efficiency (T_N / T_4N) / 4.

Fresh subprocess per level → fresh JVM, no warm-cache bleed.

Usage: python scripts/scaling.py [--n 8] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    small = run_bench(args.n, args.sf)
    big = run_bench(args.n * 4, args.sf)
    speedup = small["value"] / big["value"] if big["value"] else None
    eff = speedup / 4 if speedup else None
    print(
        json.dumps(
            {
                "sf": args.sf,
                "n_small": args.n,
                "n_big": args.n * 4,
                "total_sec_small": small["value"],
                "total_sec_big": big["value"],
                "triples_per_sec_small": small["triples_per_sec"],
                "triples_per_sec_big": big["triples_per_sec"],
                "speedup": round(speedup, 3) if speedup else None,
                "scaling_efficiency": round(eff, 3) if eff else None,
                "queries_small": small["queries"],
                "queries_big": big["queries"],
            }
        )
    )


if __name__ == "__main__":
    main()
