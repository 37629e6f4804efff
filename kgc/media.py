"""Multimodal columns — opaque binary payloads + typed metadata.

The interleaved corpus (input_hint) carries media spans as
``media_ref`` pointers.  This module supplies the Spark-side plumbing a
100 TB multimodal pipeline needs: a typed media table, Arrow-batched
decode / feature-extract / frame-sample operators, and the join back to
document spans.

The actual byte decoding (image/audio libs) is NOT available in this
container, so the decode step is STUBBED two ways:
  * mode='fake'   — deterministic md5-derived features (real schema,
    real batching, real partitioning; values are a stable fake)
  * mode='strict' — raises NotImplementedError with the dependency
    name, exactly where pillow/librosa would be called on a cluster.

Everything around the stub — schema, mapInPandas batch shape,
partition-by-media-kind routing, span join — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def media_table_from_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → media rows, one per media span.

    Payload is a deterministic fake derived from the ref (the corpus's
    real payloads live behind the media_ref pointer in object storage;
    at cluster scale this projection is a scan of the media manifest,
    not a byte fetch — bytes are only pulled inside the decode stage)."""
    m = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select(
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
        )
        .dropDuplicates(["media_ref"])
    )
    return m.select(
        "media_ref",
        "kind",
        F.encode(F.md5(F.col("media_ref")), "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("media_ref")).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic 8-dim feature vector from the payload bytes."""
    h = hashlib.md5(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    mode='strict' raises where the real decoder would run — pillow for
    images, librosa for audio, pyav for video (none ship here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "media decode requires pillow/librosa/pyav; "
                    "this container ships none — run with mode='fake' "
                    "or install decoders on the cluster image"
                )
            feats = pdf["payload"].map(_fake_features)
            # fake decode also yields fake dimensions (stable per ref)
            dims = pdf["payload"].map(
                lambda p: (
                    64 + (p[0] if len(p) else 0) % 64,
                    64 + (p[-1] if len(p) else 0) % 64,
                )
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_features", T.ArrayType(T.FloatType())),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emit n_frames feature rows per
    media item (1:N mapInPandas — the real sampler would seek/decode
    keyframes; the fake derives per-frame features from payload+idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "frame_idx": [], "frame_features": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                for i in range(n_frames):
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(i)
                    rows["frame_features"].append(
                        _fake_features((payload or b"") + bytes([i]))
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, FRAMES_SCHEMA)


def media_triples(features: DataFrame) -> DataFrame:
    """Media features → KG triples: (media:<ref>, @type/kind/dims)."""
    subj = F.concat(F.lit("media:"), F.col("media_ref"))
    rows = [
        features.select(
            subj.alias("subj"), F.lit("@type").alias("pred"),
            F.initcap(F.col("kind")).alias("obj"), F.lit("literal").alias("obj_type"),
        ),
        features.select(
            subj.alias("subj"), F.lit("width").alias("pred"),
            F.col("width").cast("string").alias("obj"), F.lit("literal").alias("obj_type"),
        ),
        features.select(
            subj.alias("subj"), F.lit("height").alias("pred"),
            F.col("height").cast("string").alias("obj"), F.lit("literal").alias("obj_type"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
