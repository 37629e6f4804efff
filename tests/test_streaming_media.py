"""Structured Streaming stages + multimodal media plumbing."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kgc import media, streaming, synth


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # Spark's streaming file source requires a DIRECTORY; the testdata
    # tables are single parquet files — stage a copy (same pattern as
    # test_sessionize_events, which always passed for this reason).
    d = tmp_path_factory.mktemp("events_stream_src")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def documents_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream_src")
    shutil.copy(f"{sf_dir}/documents.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_event_rollup_matches_batch(spark, events_dir):
    roll = streaming.stream_event_rollup(spark, events_dir, window="1 hour")
    got = streaming.run_available_now(roll, "rollup_test", output_mode="complete")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("win.start").alias("win_start"), "n")
    )
    g = {(r["event_type"], r["win_start"], r["n"]) for r in got.collect()}
    b = {(r["event_type"], r["win_start"], r["n"]) for r in batch.collect()}
    assert g == b


def test_watermark_drops_late_events(spark, tmp_path):
    """Multi-batch drain: the watermark must ADVANCE between micro-batches
    and drop an event that arrives 5 hours behind it (append mode), while
    finalized windows are emitted exactly once with the on-time counts."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_src"
    d.mkdir()

    def write(name: str, rows, mtime: float) -> None:
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        # micros, not pandas-default nanos — Spark reads timestamp(us)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), d / name)
        os.utime(d / name, (mtime, mtime))

    now = _time.time()
    # batch 0: one event per hour 00..10 → watermark after it = 10:15 - 2h
    write(
        "a.parquet",
        [
            (i, f"2026-01-01 {h:02d}:15:00", 1, "click", 1.0, "{}")
            for i, h in enumerate(range(0, 11))
        ],
        now - 100,  # FileStreamSource orders by mod time: a, b, c
    )
    # batch 1: on-time filler — windows ≤ 08:15 are finalized/EVICTED at
    # the end of this batch (the watermark computed from batch 0 takes
    # effect here; eviction happens at batch end, so a late row arriving
    # IN this batch would still merge — the drop needs the next batch)
    write(
        "b.parquet",
        [(101, "2026-01-01 09:30:00", 1, "click", 1.0, "{}")],
        now - 70,
    )
    # batch 2: a LATE event at 03:30 (5h behind the 08:15 watermark,
    # state evicted → dropped) and an on-time 09:45 (window open,
    # withheld by append mode at end of drain)
    write(
        "c.parquet",
        [
            (100, "2026-01-01 03:30:00", 1, "click", 1.0, "{}"),
            (102, "2026-01-01 09:45:00", 1, "click", 1.0, "{}"),
        ],
        now - 40,
    )
    roll = streaming.stream_event_rollup(
        spark, str(d), window="1 hour", watermark="2 hours", max_files_per_trigger=1
    )
    got = streaming.run_available_now(roll, "late_drop_test", output_mode="append")
    rows = {(r["win_start"].hour, r["n"]) for r in got.collect()}
    # finalized windows = end <= final watermark (08:15) → hours 00..07,
    # one event each; the late 03:30 arrival must NOT bump hour 3 to 2
    assert rows == {(h, 1) for h in range(0, 8)}, rows


def test_stream_documents_matches_batch(spark, sf_dir, documents_dir, tmp_path):
    from kgc.mentions import detect_mentions
    from kgc.parsers import text_to_spans
    from kgc.segment import segment_documents
    from __spark_entry__ import ALIAS_ROWS

    aliases = [a for a, *_ in ALIAS_ROWS]
    stream = streaming.stream_documents(
        spark, documents_dir, aliases, max_tokens=64
    )
    got = streaming.run_available_now(stream, "docs_stream_test")
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        text_to_spans("text").alias("spans"),
    )
    batch = detect_mentions(
        segment_documents(batch_docs, max_tokens=64).select(
            "doc_id", "seg_id", "seg_text"
        ),
        aliases,
    )
    cols = ["doc_id", "seg_id", "alias", "tok_begin"]
    assert got.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(got.select(cols)).count() == 0


def test_sessionize_events(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap; the second session
    # stays OPEN at end-of-stream (timeout never fires under availableNow)
    for i in range(3):
        rows.append((i, base + dt.timedelta(minutes=5 * i), 1, "click", 1.0, "{}"))
    for i in range(2):
        rows.append((10 + i, base + dt.timedelta(hours=3, minutes=i), 1, "click", 1.0, "{}"))
    src = tmp_path / "events_session"
    spark.createDataFrame(rows, streaming.EVENTS_SCHEMA).write.parquet(str(src))
    sess = streaming.sessionize_events(spark, str(src), gap="30 minutes")
    got = streaming.run_available_now(sess, "sess_test").collect()
    closed = [(r["n_events"], r["session_start"], r["session_end"]) for r in got]
    assert len(closed) == 1
    n, s, e = closed[0]
    assert n == 3 and s == base and e == base + dt.timedelta(minutes=10)


def test_stream_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Streaming G8: a parquet sink + checkpointLocation gives
    exactly-once file processing across query RESTARTS — the second
    drain picks up only the file that landed after the first, never
    reprocessing the first one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(f"{sf_dir}/documents.parquet", src / "a.parquet")

    def drain():
        stream = (
            spark.readStream.schema(streaming.DOCS_SCHEMA)
            .parquet(str(src))
            .select("doc_id", "n_chars")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain()
    n_a = spark.read.parquet(out).count()
    base = pq.read_table(src / "a.parquet").to_pandas()
    shifted = base.assign(doc_id=base["doc_id"] + 1_000_000)
    pq.write_table(pa.Table.from_pandas(shifted, preserve_index=False), src / "b.parquet")
    drain()  # restart from the same checkpoint
    got = spark.read.parquet(out)
    assert got.count() == 2 * n_a  # a processed once, b once
    assert got.filter(F.col("doc_id") >= 1_000_000).count() == n_a
    # no duplicates of the first file's rows
    assert got.select("doc_id").distinct().count() == 2 * n_a


def test_media_pipeline(spark):
    docs = synth.generate_documents(spark, n_docs=60)
    m = media.media_table_from_spans(docs)
    rows = m.collect()
    assert len(rows) > 0
    assert all(r["kind"] in ("image", "audio") for r in rows)
    feats = media.decode_media(m, mode="fake")
    f = feats.collect()
    assert all(len(r["features"]) == media.FEATURE_DIM for r in f)
    # determinism
    f2 = media.decode_media(m, mode="fake")
    assert feats.exceptAll(f2).count() == 0
    # strict mode raises at the decode boundary
    with pytest.raises(Exception) as exc:
        media.decode_media(m, mode="strict").collect()
    assert "NotImplementedError" in str(exc.value) or "decode requires" in str(exc.value)
    # frame sampling fans out 1:N
    frames = media.frame_sample(m.limit(5), n_frames=3)
    assert frames.count() == 15
    # triples
    t = media.media_triples(feats)
    assert t.filter(F.col("pred") == "@type").count() == len(rows)


def test_stream_exact_dedup_first_per_key(spark, events_dir):
    from pyspark.sql import functions as F

    from kgc.streaming import EVENTS_SCHEMA, run_available_now, stream_exact_dedup

    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(events_dir))
    got = run_available_now(
        stream_exact_dedup(src.select(F.md5("props").alias("k")), ["k"]),
        "t_stream_dedup",
    )
    batch = (
        spark.read.parquet(str(events_dir))
        .select(F.md5("props").alias("k"))
        .distinct()
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in batch.collect()
    )


def test_stream_dedup_within_watermark_requires_event_time():
    import pytest

    from kgc.streaming import stream_exact_dedup

    with pytest.raises(ValueError):
        stream_exact_dedup(None, ["k"], watermark="10 minutes")


def test_streaming_triples_equal_batch(spark, sf_dir):
    """The streaming link path (min_by argmax in place of the batch
    window top-1) must construct the batch KG bit-exactly on a finite
    availableNow drain."""
    import __spark_entry__ as E

    got = E.q_streaming_triples(spark, sf_dir)
    want = E.q_entity_triples(spark, sf_dir)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_incremental_neardup_equals_batch(spark, tmp_path):
    """The foreachBatch corpus-index probe, drained over 3 micro-batches,
    must equal the one-shot batch probe row-for-row — including a
    near-dup pair split across different micro-batches."""
    from kgc.dedup import incremental_near_duplicates

    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over lazy dog number {i} "
              "with some shared trailing boilerplate text") for i in range(8)],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"the quick brown fox jumps over lazy dog number {i} "
                   "with some shared trailing boilerplate text appended")
         for i in range(6)],
        "doc_id bigint, text string",
    )
    src_dir = tmp_path / "neardup_src"
    new.repartition(3).write.parquet(str(src_dir))

    expected = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_near_duplicates(new, corpus, k=16, bands=4,
                                             threshold=0.3).collect()
    )
    assert expected, "fixture must produce near-dup pairs"

    src = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    got = streaming.stream_incremental_neardup(
        src, corpus, str(tmp_path / "neardup_out"),
        str(tmp_path / "neardup_ckpt"), k=16, bands=4, threshold=0.3,
    )
    assert sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"]) for r in got.collect()
    ) == expected


def test_stream_incremental_neardup_empty_source(spark, tmp_path):
    """Zero micro-batches (empty source dir) must return an empty
    (new_id, corpus_id, jaccard) frame, not raise on schema inference
    over a nonexistent output (ADVICE r3)."""
    corpus = spark.createDataFrame(
        [(1, "some corpus text here")], "doc_id bigint, text string"
    )
    src_dir = tmp_path / "empty_src"
    src_dir.mkdir()
    src = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(src_dir))
    )
    got = streaming.stream_incremental_neardup(
        src, corpus, str(tmp_path / "empty_out"),
        str(tmp_path / "empty_ckpt"), k=16, bands=4, threshold=0.3,
    )
    assert got.columns == ["new_id", "corpus_id", "jaccard"]
    assert got.count() == 0


def test_stream_incremental_neardup_restart_resume(spark, tmp_path):
    """A second drain with the SAME checkpoint/out dirs after new files
    land must process ONLY the new files (checkpoint skip) and leave no
    duplicate pairs (batch-partitioned idempotent sink)."""
    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(10))) for i in range(4)],
        "doc_id bigint, text string",
    )
    src_dir = tmp_path / "src"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def batch_df(ids):
        return spark.createDataFrame(
            [(100 + i, " ".join(f"w{i}x{j}" for j in range(10)) + " more")
             for i in ids],
            "doc_id bigint, text string",
        )

    def drain():
        src = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        return streaming.stream_incremental_neardup(
            src, corpus, out, ckpt, k=16, bands=4, threshold=0.3,
        )

    batch_df([0, 1]).coalesce(1).write.mode("append").parquet(str(src_dir))
    first = {(r["new_id"], r["corpus_id"]) for r in drain().collect()}
    assert first == {(100, 0), (101, 1)}

    batch_df([2, 3]).coalesce(1).write.mode("append").parquet(str(src_dir))
    second = [(r["new_id"], r["corpus_id"]) for r in drain().collect()]
    assert sorted(second) == [(100, 0), (101, 1), (102, 2), (103, 3)]
    assert len(second) == len(set(second))  # no replay duplicates
