#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule): run the synthetic
KG-pipeline job at local[N] and local[4N] on the SAME input, report
throughput at both and the scaling efficiency (T_N / T_4N) / 4.

Fresh subprocess per leg → fresh JVM, no warm-cache bleed.

``--rounds R`` (R > 1) switches to the INTERLEAVED A/B/A/B protocol
(VERDICT r2 'Next round' #3): the small and big legs alternate within
one session so both sample the same co-tenant load distribution — a
one-shot big leg that lands in a neighbor's burst can no longer skew
the ratio.  Per-leg statistic = MIN across rounds (the standard
least-interference estimator on a shared box); per-round paired
efficiencies are also reported so a skeptic can see the spread.

Usage: python scripts/scaling.py [--n 8] [--rounds 3] [--n-docs 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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


def run_synth(cpus: int, n_docs: int, passes: int = 3, controls: bool = False) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SCALE_PASSES=str(passes),
        SPARK_GRAFT_SCALE_CONTROLS="1" if controls else "0",
    )
    cmd = [sys.executable, os.path.join(REPO, "scripts", "scale_job.py"),
           "--n-docs", str(n_docs)]
    # Pin the WHOLE process tree (JVM + python workers) to exactly
    # `cpus` cores.  local[N] alone does not confine the JVM's GC/JIT
    # threads or the pyspark daemons, so on a 32-core host an
    # unpinned local[8] borrows idle cores and understates the true
    # 8->32 speedup (measured: 0.55 "efficiency" unpinned vs 0.84
    # pinned).  This is the faithful N-vs-4N cluster stand-in.
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--mode", choices=["bench", "synth"], default="synth",
        help="synth: compute-dominated KG pipeline on a deterministic "
        "synthetic corpus (the scaling-efficiency evidence); bench: the "
        "full headline query set (fixed per-query plan-compile overhead "
        "dominates at sf0.1, so efficiency reads low)",
    )
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument(
        "--rounds", type=int, default=1,
        help=">1: interleaved A/B/A/B protocol (synth mode only) — "
        "alternate small/big legs, MIN per leg across rounds",
    )
    ap.add_argument(
        "--controls", action="store_true",
        help="time the per-leg attribution controls inside each pinned "
        "session (control_cpu: pure-ALU md5 — ~1.0 efficiency iff the "
        "window is quiet; control_bw: 3.2 GB streaming sum — the "
        "single-box memory-bandwidth ceiling a real cluster lacks)",
    )
    args = ap.parse_args()

    if args.mode == "synth" and args.rounds > 1:
        rounds = []
        for r in range(args.rounds):
            small = run_synth(args.n, args.n_docs, passes=2, controls=args.controls)
            big = run_synth(args.n * 4, args.n_docs, passes=2, controls=args.controls)
            rounds.append((small, big))
            pair_eff = (small["elapsed_sec"] / big["elapsed_sec"]) / 4
            print(
                f"# round {r + 1}/{args.rounds}: small={small['elapsed_sec']}s "
                f"big={big['elapsed_sec']}s paired_eff={pair_eff:.3f}",
                file=sys.stderr,
            )
        t_small = min(s["elapsed_sec"] for s, _ in rounds)
        t_big = min(b["elapsed_sec"] for _, b in rounds)
        n_triples = rounds[0][0]["n_triples"]
        speedup = t_small / t_big
        print(
            json.dumps(
                {
                    "mode": "synth-interleaved",
                    "protocol": "A/B alternating × rounds, min per leg",
                    "input": f"synth:{args.n_docs}docs",
                    "n_small": args.n,
                    "n_big": args.n * 4,
                    "rounds": args.rounds,
                    "per_round_small_sec": [s["elapsed_sec"] for s, _ in rounds],
                    "per_round_big_sec": [b["elapsed_sec"] for _, b in rounds],
                    "per_round_paired_efficiency": [
                        round((s["elapsed_sec"] / b["elapsed_sec"]) / 4, 3)
                        for s, b in rounds
                    ],
                    "elapsed_sec_small": t_small,
                    "elapsed_sec_big": t_big,
                    "triples_per_sec_small": round(n_triples / t_small, 1),
                    "triples_per_sec_big": round(n_triples / t_big, 1),
                    "speedup": round(speedup, 3),
                    "scaling_efficiency": round(speedup / 4, 3),
                    **(
                        {
                            "control_cpu_sec_small": min(
                                s["control_cpu_sec"] for s, _ in rounds),
                            "control_cpu_sec_big": min(
                                b["control_cpu_sec"] for _, b in rounds),
                            "control_cpu_efficiency": round(
                                min(s["control_cpu_sec"] for s, _ in rounds)
                                / min(b["control_cpu_sec"] for _, b in rounds)
                                / 4, 3),
                            "control_bw_sec_small": min(
                                s["control_bw_sec"] for s, _ in rounds),
                            "control_bw_sec_big": min(
                                b["control_bw_sec"] for _, b in rounds),
                            "control_bw_efficiency": round(
                                min(s["control_bw_sec"] for s, _ in rounds)
                                / min(b["control_bw_sec"] for _, b in rounds)
                                / 4, 3),
                        }
                        if args.controls else {}
                    ),
                }
            )
        )
        return

    if args.mode == "synth":
        small = run_synth(args.n, args.n_docs)
        big = run_synth(args.n * 4, args.n_docs)
        t_small, t_big = small["elapsed_sec"], big["elapsed_sec"]
        tput_small, tput_big = small["triples_per_sec"], big["triples_per_sec"]
    else:
        small = run_bench(args.n, args.sf)
        big = run_bench(args.n * 4, args.sf)
        t_small, t_big = small["value"], big["value"]
        tput_small, tput_big = small["triples_per_sec"], big["triples_per_sec"]

    speedup = t_small / t_big if t_big else None
    eff = speedup / 4 if speedup else None
    print(
        json.dumps(
            {
                "mode": args.mode,
                "input": args.sf if args.mode == "bench" else f"synth:{args.n_docs}docs",
                "n_small": args.n,
                "n_big": args.n * 4,
                "elapsed_sec_small": t_small,
                "elapsed_sec_big": t_big,
                "triples_per_sec_small": tput_small,
                "triples_per_sec_big": tput_big,
                "speedup": round(speedup, 3) if speedup else None,
                "scaling_efficiency": round(eff, 3) if eff else None,
            }
        )
    )


if __name__ == "__main__":
    main()
