"""End-to-end KG-construction pipeline (the reference's convert() loop,
re-expressed as one staged Spark job — SURVEY §3 lifecycle).

    docs → spans (parse) → segments (pack) → mentions (dict scan)
         → link (exact + LSH fuzzy) → canonicalize (connected comps)
         → triples (+ @context table) → metrics

Each stage optionally lands in a StageStore (parquet + manifest locally,
Iceberg on a cluster) so a rerun resumes from the last committed stage
via anti-join on doc_id (G8).

Run: ``python -m kgc.pipeline --sf /root/testdata/sf0.001``
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgc import canon, link, mentions, metrics, parsers, segment, triples, vocab
from kgc.checkpoint import StageStore
from kgc.synth import ALIASES


# ------------------------------------------------------------------- E2 ---
# extractSchemaOrgType's priority list (converter.go:147): the FIRST of
# these present wins, fallback "Thing".
COMMON_TYPES = ["Article", "Person", "Event", "Organization", "Place", "CreativeWork", "Thing"]


def classify_main_type(
    segments_df: DataFrame, linked: DataFrame
) -> DataFrame:
    """Deterministic E2 (determineMainType, converter.go:122-141):
    the segment's main type is the first type of the reference's
    commonTypes priority list (converter.go:147-156) that any linked
    entity in the segment carries; fallback 'Thing' exactly as the
    reference (converter.go:168).

    One groupBy on (doc_id, seg_id) collecting the distinct type set —
    map-side partial aggregation keeps the shuffle narrow.
    """
    votes = linked.groupBy("doc_id", "seg_id").agg(
        F.collect_set("entity_type").alias("_types")
    )
    pick = F.coalesce(
        *[
            F.when(F.array_contains(F.col("_types"), t), F.lit(t))
            for t in COMMON_TYPES
        ],
        F.lit("Thing"),
    )
    return (
        segments_df.join(votes, ["doc_id", "seg_id"], "left")
        .withColumn(
            "main_type",
            F.when(F.col("_types").isNotNull(), pick).otherwise(F.lit("Thing")),
        )
        .drop("_types")
    )


# -------------------------------------------------------- entity triples ---
_TYPE_PRED = {
    "Person": "mentions",
    "Place": "locations",
    "Event": "events",
}


def entity_triples(linked_canon: DataFrame) -> DataFrame:
    """Linked+canonicalized mentions → KG triples.

    seg --pred--> ent:<canonical_id>;  ent node gets @type + name.
    pred follows the reference's emission vocabulary: Person→mentions,
    Place→locations, Event→events (converter.go:252-314), everything
    else → 'about'.  One narrow projection + a dedup shuffle (G7).

    The three triples per linked mention are emitted as a single
    array(struct)->explode projection, NOT a 3-way self-union: a union
    plans the upstream segment→mention→link lineage once PER LEG (3×
    the scan/UDF work when the input isn't cached — real money at
    10^12 docs), and Spark's DeduplicateRelations re-ids each leg,
    which in 4.1.2 can strand the pack_spans pandas UDF inside a plain
    Project (unevaluable) when the spans column is itself a
    lambda-bearing expression (e.g. kgc.synth's transform(sequence..)).
    One leg → one scan, no relation dedup, no hazard.
    """
    pred = F.coalesce(
        *[
            F.when(F.col("entity_type") == t, F.lit(p))
            for t, p in _TYPE_PRED.items()
        ],
        F.lit("about"),
    )
    seg_subj = F.concat(
        F.lit("seg:"), F.col("doc_id").cast("string"), F.lit("#"),
        F.col("seg_id").cast("string"),
    )
    ent = F.concat(F.lit("ent:"), F.col("canonical_id"))

    def _t(subj, pred_c, obj, obj_type):
        return F.struct(
            subj.alias("subj"),
            pred_c.alias("pred"),
            obj.alias("obj"),
            obj_type.alias("obj_type"),
        )

    trips = F.array(
        _t(seg_subj, pred, ent, F.lit("node")),
        _t(ent, F.lit("@type"), F.col("entity_type"), F.lit("literal")),
        _t(ent, F.lit("name"), F.col("alias"), F.lit("literal")),
    )
    return linked_canon.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("seg_id").cast("int").alias("seg_id"),
        F.explode(trips).alias("t"),
    ).select("doc_id", "seg_id", "t.subj", "t.pred", "t.obj", "t.obj_type")


# ----------------------------------------------------------- quarantine ---
def quarantine_table(
    docs: DataFrame,
    guarded_segs: DataFrame,
    token_limit: int,
) -> DataFrame:
    """C5/E6 — per-stage quarantine table (doc_id, seg_id, stage, reason).

    Relational form of the reference's error taxonomy
    (internal/jsonld/error.go:7-33): ConversionError(stage) → the
    ``stage`` column; TokenLimitError(limit, count) → reason
    'token_limit_exceeded' with the count in ``detail``.  At 10^12 docs
    a poison row must never kill the job — bad rows route HERE and the
    healthy flow continues (SURVEY C5).
    """
    if "parse_error" in docs.columns:
        # parse_documents(pdf_col=...) carries the real failure reason
        # (PdfUnsupportedError message etc.) out of the Arrow batch
        reason = F.when(
            F.col("parse_error").isNotNull(), F.lit("pdf_unsupported")
        ).otherwise(F.lit("empty_document"))
        detail = F.col("parse_error")
    else:
        reason = F.lit("empty_document")
        detail = F.lit(None).cast("string")
    q_parse = docs.filter(F.size("spans") == 0).select(
        "doc_id",
        F.lit(None).cast("int").alias("seg_id"),
        F.lit("parse").alias("stage"),
        reason.alias("reason"),
        detail.alias("detail"),
    )
    q_seg = guarded_segs.filter(~F.col("ok")).select(
        "doc_id",
        F.col("seg_id").cast("int").alias("seg_id"),
        F.lit("segment").alias("stage"),
        F.lit("token_limit_exceeded").alias("reason"),
        F.concat(
            F.lit("n_tokens="), F.col("n_tokens").cast("string"),
            F.lit(" limit="), F.lit(str(token_limit)),
        ).alias("detail"),
    )
    return q_parse.unionByName(q_seg)


def release(stages: dict[str, DataFrame]) -> None:
    """Unpersist every cache pinned by ``run`` (and by operators that
    attach their internal persists via ``_kgc_pinned``).  Call once the
    stage outputs are materialized — in a long-lived session the stage
    caches are otherwise a leak (VERDICT r1 'What's wrong' #4)."""
    seen = set()
    for df in stages.values():
        if not isinstance(df, DataFrame):
            continue
        for p in [df, *getattr(df, "_kgc_pinned", [])]:
            if id(p) in seen:
                continue
            seen.add(id(p))
            try:
                if p.storageLevel.useMemory or p.storageLevel.useDisk:
                    p.unpersist(blocking=True)
            except Exception:
                pass


# ------------------------------------------------------------- pipeline ---
def input_fingerprint(docs: DataFrame) -> str:
    """Cheap deterministic input identity for resume validation: row
    count + crc32-sum of doc_ids.  One narrow scan; only paid when a
    StageStore is attached (restart-time, not steady-state)."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.crc32(F.col("doc_id").cast("string"))), F.lit(0)).alias("c"),
    ).first()
    return f"{row['n']}:{row['c']}"


def run(
    spark: SparkSession,
    docs: DataFrame,
    alias_df: DataFrame | None = None,
    max_tokens: int = 200,
    store: StageStore | None = None,
    fuzzy: bool = True,
    seg_token_limit: int | None = None,
    bucket_stages: int | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline.  ``docs`` needs (doc_id, spans) or (doc_id, text).

    Returns every stage DataFrame; with a StageStore, stages already
    committed AND fingerprint-matching the current input are read back
    instead of recomputed (resume path — a changed input invalidates
    the stage rather than silently serving stale output; ADVICE r1).
    Segments violating the token guard (E6) and unparseable docs land
    in stages['quarantine'] instead of the healthy flow.  Call
    :func:`release` when done with the outputs to drop the stage
    caches.

    ``bucket_stages=N`` (needs a store) materializes every stage as a
    table bucketed+sorted on doc_id into N buckets: downstream doc_id
    joins between stages — and the restart anti-join — run with no
    shuffle exchange, the Iceberg bucket-partitioning posture
    (StageStore.write_bucketed).
    """
    alias_df = alias_df if alias_df is not None else _default_alias_df(spark)
    # one driver-side distinct of the dictionary; detect_mentions ships
    # it back out as a real sc.broadcast (once per worker), and the scan
    # trie is built once per Python worker process (kgc/mentions.py)
    aliases = [r["alias"] for r in alias_df.select("alias").distinct().collect()]
    limit = seg_token_limit if seg_token_limit is not None else max_tokens

    if "spans" not in docs.columns:
        src = "source" if "source" in docs.columns else None
        pdf = "payload" if "payload" in docs.columns else None
        docs = parsers.parse_documents(
            docs, text_col="text", source_col=src, pdf_col=pdf
        )
    keep = [F.col("doc_id").cast("string").alias("doc_id"), F.col("spans")]
    if "parse_error" in docs.columns:  # real parse-failure reason → quarantine
        keep.append(F.col("parse_error"))
    docs = docs.select(*keep)

    fp = input_fingerprint(docs) if store is not None else None
    pinned: list[DataFrame] = []

    def stage(name: str, make):
        if store is not None:
            if store.is_valid(name, fp):
                if bucket_stages:
                    return store.read_bucketed(spark, name)
                return store.read(spark, name)
            store.invalidate(name)
            made = make()
            if bucket_stages and "doc_id" in made.columns:
                out = store.write_bucketed(
                    made, name, key="doc_id", buckets=bucket_stages,
                    extra={"fingerprint": fp},
                )
            else:
                out = store.write(made, name, extra={"fingerprint": fp})
            # the stage is on disk now — drop any caches the operator
            # pinned internally (e.g. link_mentions' mention table)
            for p in getattr(made, "_kgc_pinned", []):
                p.unpersist()
            if made.storageLevel.useMemory or made.storageLevel.useDisk:
                made.unpersist()
            return out
        # No store: persist as the stage boundary.  Stage outputs are
        # consumed by several downstream branches (typing + triples);
        # the boundary both avoids recomputing the UDF stages per
        # branch and sidesteps Spark 4.1's self-union re-clone leaving
        # pandas UDFs un-extracted in JVM projects.  Pinned caches are
        # released by :func:`release` once consumers materialize.
        from pyspark import StorageLevel

        df = make().persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(df)
        pinned.extend(getattr(df, "_kgc_pinned", []))
        return df

    segs_all = stage(
        "segments",
        lambda: segment.token_guard(
            segment.segment_documents(docs, max_tokens=max_tokens), limit
        ),
    )
    quar = quarantine_table(docs, segs_all, limit)
    segs = segs_all.filter(F.col("ok")).drop("ok")
    ment = stage(
        "mentions",
        lambda: mentions.detect_mentions(
            segs.select("doc_id", "seg_id", "seg_text"), aliases
        ),
    )
    linked = stage(
        "linked", lambda: link.link_mentions(ment, alias_df, fuzzy=fuzzy)
    )
    linked_canon = stage(
        "canonical", lambda: canon.canonicalize_entities(linked, alias_df)
    )
    typed_segs = classify_main_type(
        segs.select("doc_id", "seg_id"), linked_canon
    )
    ents = entity_triples(linked_canon)
    seg_types = typed_segs.select(
        "doc_id", "seg_id",
        F.concat(
            F.lit("seg:"), F.col("doc_id"), F.lit("#"), F.col("seg_id").cast("string")
        ).alias("subj"),
        F.lit("@type").alias("pred"),
        F.col("main_type").alias("obj"),
        F.lit("literal").alias("obj_type"),
    )
    trip = stage(
        "triples",
        lambda: triples.dedup_triples(ents.unionByName(seg_types)),
    )
    # per-document view for the JSON-LD sink: dedup scoped to the doc so
    # every rendered file is self-contained (an entity's @type/name node
    # appears in EACH doc that references it, like the reference's
    # per-document outputs) — the global `triples` table stays the
    # storage-efficient representation.
    doc_trip = ents.unionByName(seg_types).dropDuplicates(
        ["doc_id", "subj", "pred", "obj"]
    )
    types_df, props_df = vocab.builtin_vocab(spark)
    ctx = vocab.context_table(types_df, props_df)

    out = {
        "documents": docs,
        "segments": segs,
        "mentions": ment,
        "linked": linked,
        "canonical": linked_canon,
        "triples": trip,
        "doc_triples": doc_trip,
        "context": ctx,
        "quarantine": quar,
    }
    # expose pinned caches on the dict consumer-side release
    out["segments"]._kgc_pinned = pinned  # type: ignore[attr-defined]
    return out


def _default_alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(a, e, t, w) for a, e, t, w in ALIASES],
        "alias string, entity_id string, entity_type string, weight double",
    )


def run_metrics(stages: dict[str, DataFrame]) -> DataFrame:
    lineage = metrics.stage_summary(
        {k: v for k, v in stages.items() if k in ("segments", "mentions", "triples")}
    )
    return lineage


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="StageStore dir (enables resume)")
    ap.add_argument("--max-tokens", type=int, default=200)
    ap.add_argument("--no-fuzzy", action="store_true")
    args = ap.parse_args()

    from kgc.session import get_spark
    from kgc.synth import testdata_alias_df

    spark = get_spark("kgc-pipeline")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    alias_df = testdata_alias_df(spark)
    store = StageStore(args.out) if args.out else None
    t0 = time.time()
    stages = run(
        spark, docs, alias_df=alias_df, store=store,
        max_tokens=args.max_tokens, fuzzy=not args.no_fuzzy,
    )
    n_triples = stages["triples"].count()
    elapsed = time.time() - t0
    pred_counts = {
        r["pred"]: r["n_triples"]
        for r in metrics.triple_metrics(stages["triples"]).collect()
    }
    print(
        json.dumps(
            {
                "n_docs": stages["documents"].count(),
                "n_segments": stages["segments"].count(),
                "n_mentions": stages["mentions"].count(),
                "n_triples": n_triples,
                "triples_per_sec": n_triples / elapsed if elapsed else None,
                "elapsed_sec": round(elapsed, 2),
                "pred_counts": pred_counts,
            }
        )
    )


if __name__ == "__main__":
    main()
