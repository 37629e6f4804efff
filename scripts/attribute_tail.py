#!/usr/bin/env python
"""Attribute the r4 cheap-query bench uplift (VERDICT r4 "What's
wrong" #2): langid +60%, corpus_mix +29%, dup_ngrams +25%, lm_score
+20%, repetition +5% vs r3 — all sub-3 s, all unrelated plans, so the
suspected cause is the r4 PROTOCOL change (passes interleaved across
queries → colder executor/OS caches between a query's passes) rather
than any plan change.

Design: ONE session, ONLY the five tail jobs built (also isolates the
grown-registry hypothesis — if the r4 numbers reproduce here with five
plans instead of ~40, registry size is exonerated).  Three phases:

  A. interleaved passes (r4 protocol), N passes
  B. consecutive passes per query (r3 protocol), N passes
  C. interleaved again (controls for slow session drift / co-tenant
     windows: if C ≈ A ≠ B the effect is protocol, not time)

Each phase reports per-query min — the exact statistic BENCH uses.
A fixed ~0.5 s control job threads through as the noise floor.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "4"))

    import __spark_entry__ as em
    from kgc.session import get_spark

    spark = get_spark(
        "kgc-attr", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    control_df = spark.range(0, 24_000_000, 1, numPartitions=cpus * 2).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    control_df.write.format("noop").mode("overwrite").save()

    def timed(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    jobs = [
        ("langid", em.q_langid(spark, sf_dir)),
        ("corpus_mix", em.q_corpus_mix(spark, sf_dir)),
        ("lm_score", em.q_lm_score(spark, sf_dir)),
        ("repetition", em.q_repetition(spark, sf_dir)),
        ("dup_ngrams", em.q_dup_ngrams(spark, sf_dir)),
    ]
    # one untimed warm pass per job: absorb Janino codegen, so both
    # protocols start from the same compiled state (bench does the same
    # implicitly via its first recorded pass; here we want the protocol
    # difference isolated to CACHE state, not compile state)
    for _, df in jobs:
        spark.catalog.clearCache()
        timed(df)

    phases: dict[str, dict] = {}

    def record(phase: str, name: str, dt: float) -> None:
        phases.setdefault(phase, {}).setdefault(name, []).append(dt)

    controls: list[dict] = []

    def run_control(tag: str) -> None:
        controls.append({"at": tag, "sec": timed(control_df)})

    run_control("start")
    # Phase A: interleaved (r4 protocol)
    for p in range(n_passes):
        for name, df in jobs:
            spark.catalog.clearCache()
            record("A_interleaved", name, timed(df))
        run_control(f"A_pass{p}")
    # Phase B: consecutive (r3 protocol)
    for name, df in jobs:
        for _ in range(n_passes):
            spark.catalog.clearCache()
            record("B_consecutive", name, timed(df))
        run_control(f"B_{name}")
    # Phase C: interleaved again (drift control)
    for p in range(n_passes):
        for name, df in jobs:
            spark.catalog.clearCache()
            record("C_interleaved", name, timed(df))
        run_control(f"C_pass{p}")

    out = {
        "sf": sf_dir,
        "cpus": cpus,
        "n_passes": n_passes,
        "mins": {
            ph: {n: min(v) for n, v in qs.items()} for ph, qs in phases.items()
        },
        "passes": phases,
        "control": controls,
        "control_min": min(c["sec"] for c in controls),
        "control_max": max(c["sec"] for c in controls),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
