"""G3/G4 — minhash-LSH blocking + entity-link scoring.

The reference resolves entity identity implicitly through the LLM's
running AnalysisContext (internal/llm/interface.go:7-11,
internal/jsonld/converter.go:57).  Our engine makes it explicit and
distributed:

* exact path (G4): mentions ⨝ broadcast alias dictionary on the
  normalized surface form; score = prior weight boosted by match
  specificity; top-1 per mention via a window.
* fuzzy path (G3): mentions with no exact hit are blocked against the
  dictionary by minhash-LSH over character 3-gram shingles, candidate
  pairs verified with exact Jaccard, then scored like the exact path.

Everything is Catalyst expressions — the minhash signature is an
``array_min`` over md5 hashes (lexicographic min of uniform hex strings
is a valid minhash), so the same computation is expressible in ANSI SQL
for the DuckDB oracle.  md5 (not xxhash64) precisely so both engines
produce identical values.

Scale notes: the alias dictionary is the small side everywhere
(broadcast — no shuffle); the only wide exchange is the window top-1,
partitioned by mention key.  LSH band join keys are md5 strings —
uniformly distributed, no skew by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------- shingles ---
def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of lower(col), as an array<string>.

    Pure Catalyst: transform over a sequence of start offsets.  Strings
    shorter than n yield the whole string as a single shingle.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    ln = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.array_distinct(F.when(ln > 0, grams).otherwise(F.array().cast("array<string>")))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-TOKENIZED array.

    Pass an attribute (column from a previous projection), not an
    inline tokenizer expression — the gram lambda slices `toks` once
    per gram, so an inlined regexp tokenizer would re-run O(n_tokens)
    times per row."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(
        F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))
    )


def token_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (for document-level dedup).

    Column-API convenience; on large scans prefer a two-step select
    with ``shingles_from_tokens`` (see its docstring)."""
    toks = F.regexp_extract_all(
        F.lower(F.col(col) if isinstance(col, str) else col), F.lit(r"(?U)[^\W_]+"), 0
    )
    return shingles_from_tokens(toks, n)


def make_shingle_udf(n: int = 3):
    """Arrow-batched twin of ``norm_tokens`` + ``shingles_from_tokens``
    — text → distinct word n-gram shingles, first-occurrence order.

    Higher-order functions never enter whole-stage codegen, so the
    Catalyst shingle build (transform + array_join(slice) +
    array_distinct, all interpreted) was the single largest stage of
    minhash_pairs at sf0.1 (4.6 s of 8 s).  One Python loop per doc
    under Arrow batching is several times cheaper, and the values are
    IDENTICAL: Python's ``[^\\W_]+``/lower() tokenization equals the
    Catalyst ``(?U)[^\\W_]+``/lower() class — the same equivalence the
    mention scanner has relied on since round 2 (kgc/mentions
    norm_tokens_py vs _norm_tokens_expr, oracle-green), and
    ``dict.fromkeys`` reproduces array_distinct's first-occurrence
    order.  Twin equality is pytest-pinned on the synthetic corpus
    (tests/test_dataops.py)."""
    import re as _re

    tok = _re.compile(r"[^\W_]+", _re.UNICODE)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def sh(texts: pd.Series) -> pd.Series:
        def one(t):
            toks = tok.findall((t or "").lower())
            if not toks:
                return []
            m = len(toks) - (n - 1)
            if m < 1:
                m = 1
            return list(dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(m)
            ))

        return texts.map(one)

    return sh


MINHASH_DOC_TYPE = T.StructType(
    [
        T.StructField("sh", T.ArrayType(T.StringType())),
        T.StructField(
            "bands",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("band", T.IntegerType()),
                        T.StructField("key", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def make_shingle_band_udf(n: int = 3, k: int = 32, bands: int = 8):
    """Arrow-batched twin of shingles + :func:`lsh_band_keys` in ONE
    per-doc pass: text → (sh, [(band, key)]).

    Why: the lanes-as-data band build explodes |shingles|·k rows
    through a min(string) aggregation, and Spark's HashAggregate only
    takes fixed-size mutable buffers — min over strings falls back to
    SortAggregate, a full sort of the exploded table on BOTH sides of
    the exchange (3.6 s of minhash_pairs' 5.4 s at sf0.1 after the
    shingle UDF landed).  Here the per-lane minima fold inside the
    Arrow batch — no explode, no shuffle, no sort; the only wide op
    left in the band table build is the final explode of bands-per-doc
    (consumed from a persisted cache, so the
    InferFiltersFromGenerate hazard does not apply).

    Values are BIT-IDENTICAL to the Catalyst/DuckDB derivation:
    hashlib.md5 over UTF-8 == Spark md5(concat(lane, '|', shingle)) ==
    DuckDB md5(lane || '|' || shingle); Python min over lowercase hex
    strings is the same lexicographic order; band key =
    md5('|'.join(lane minima in lane order)) = md5(concat_ws('|',
    lanes-in-band)).  Twin equality vs lsh_band_keys is pytest-pinned
    (tests/test_dataops.py), and the oracle SQL is untouched.
    """
    import hashlib
    import re as _re

    rows = k // bands
    tok = _re.compile(r"[^\W_]+", _re.UNICODE)
    lane_prefixes = [f"{i}|".encode() for i in range(k)]
    md5 = hashlib.md5

    @F.pandas_udf(MINHASH_DOC_TYPE)
    def f(texts: pd.Series) -> pd.DataFrame:
        shs, bnds = [], []
        for t in texts:
            toks = tok.findall((t or "").lower())
            if not toks:
                shs.append([])
                bnds.append([])
                continue
            m = len(toks) - (n - 1)
            if m < 1:
                m = 1
            sh = list(dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(m)
            ))
            enc = [s.encode("utf-8") for s in sh]
            mins = [
                min(md5(p + e).hexdigest() for e in enc)
                for p in lane_prefixes
            ]
            shs.append(sh)
            bnds.append([
                {
                    "band": b,
                    "key": md5(
                        "|".join(mins[b * rows : (b + 1) * rows]).encode()
                    ).hexdigest(),
                }
                for b in range(bands)
            ])
        return pd.DataFrame({"sh": shs, "bands": bnds})

    return f


# -------------------------------------------------------------- minhash ---
def minhash_lane(shingles: Column, i: int) -> Column:
    """One minhash lane: min over shingles of md5(i|shingle)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
    )


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k-permutation minhash as array<string> of md5-hex minima.

    Hash family i = md5(i || '|' || shingle); the min over shingles of a
    uniform hash is the classic minhash estimator (Broder 1997).  Using
    the hex string directly keeps the computation engine-portable
    (identical in DuckDB for the oracle) at the cost of 32 bytes per
    lane — fine, signatures are tiny next to the shingle sets.

    CODEGEN NOTE (round-2 rewrite): lanes are DATA, not code — one
    transform over sequence(0, k-1) with a single md5 call site, so the
    generated/interpreted expression is O(1) in k.  Round 1 unrolled
    the k lanes into one giant projection; the resulting classes
    exhausted the JIT code cache and bench times degraded 30-80×
    mid-session (VERDICT r1 "Performance").  `shingles` should be an
    attribute from a previous projection (a cheap per-row array ref),
    so per-lane re-reference costs nothing; the md5 work is identical
    either way.  Hot scans should prefer :func:`lsh_band_keys`, which
    additionally pushes the lane loop into a map-side-combining
    aggregate.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s))
            )
        ),
    )


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Signature → array<struct<band:int, key:string>> for the block
    join.  Bands as data (sequence+transform), O(1) codegen in
    ``bands`` — see minhash_signature's codegen note."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * rows + 1, F.lit(rows)))).alias("key"),
        ),
    )


def lsh_band_keys(
    df: DataFrame,
    shingle_col: str,
    id_cols: list[str] | tuple[str, ...],
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(id_cols..., band, key) LSH band keys via explode + aggregate —
    the scale path for minhash banding.

    Lanes ride as DATA: explode the shingle array, cross with
    sequence(0, k-1), and take groupBy(min) per (id, lane).  Hash
    values are bit-identical to :func:`minhash_signature` /
    :func:`lsh_bands` (md5(lane || '|' || shingle), band key =
    md5(concat_ws('|', lanes-in-band))), so the DuckDB oracle SQL is
    unchanged.  Plan properties at scale:

    * generated code is O(1) in k — one tiny md5 expression; no JIT
      code-cache pressure (the round-1 scale killer).
    * the (id, lane) min is partial-aggregated map-side, so the only
      wide exchange carries |docs|·k tiny rows on a uniform key.
    * rows with empty shingle arrays simply produce no band keys
      (explode drops them) — same "no candidates" outcome as before.
    """
    rows = k // bands
    ids = list(id_cols)
    lanes = df.select(*ids, F.explode(F.col(shingle_col)).alias("_s")).select(
        *ids, "_s", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_lane")
    )
    minh = lanes.groupBy(*ids, "_lane").agg(
        F.min(
            F.md5(F.concat(F.col("_lane").cast("string"), F.lit("|"), F.col("_s")))
        ).alias("_mh")
    )
    return (
        minh.withColumn("_band", F.floor(F.col("_lane") / rows).cast("int"))
        .groupBy(*ids, "_band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("_lane").alias("l"), F.col("_mh").alias("m")
                                )
                            )
                        ),
                        lambda x: x["m"],
                    ),
                )
            ).alias("key")
        )
        .select(*ids, F.col("_band").alias("band"), "key")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays (verification step)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# ---------------------------------------------------------- exact link ----
def _norm_alias(colname: str) -> Column:
    # (?U): Java regex defaults \w to ASCII; the pandas-UDF scanner
    # (kgc.mentions) tokenizes with Python re.UNICODE.  Without the
    # flag, non-ASCII surfaces ('Müller') normalize differently on the
    # two paths and exact links silently drop (ADVICE r1).
    return F.array_join(
        F.regexp_extract_all(F.lower(F.col(colname)), F.lit(r"(?U)[^\W_]+"), 0), " "
    )


def link_exact(
    mentions: DataFrame,
    alias_df: DataFrame,
    mention_key: tuple[str, ...] = ("doc_id", "seg_id", "tok_begin"),
) -> DataFrame:
    """G4 exact path: broadcast join + window top-1 per mention.

    Score = weight * (1 + 0.1*(n_toks-1)) — longer surface forms are
    more specific.  Deterministic tie-break on entity_id.
    """
    adf = alias_df.select(
        _norm_alias("alias").alias("alias"), "entity_id", "entity_type", "weight"
    ).dropDuplicates(["alias", "entity_id"])
    j = mentions.join(F.broadcast(adf), "alias")
    j = j.withColumn(
        "score",
        F.col("weight") * (F.lit(1.0) + F.lit(0.1) * (F.col("n_toks") - 1)),
    )
    w = Window.partitionBy(*[F.col(c) for c in mention_key]).orderBy(
        F.col("score").desc(), F.col("entity_id").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ---------------------------------------------------------- fuzzy link ----
def link_fuzzy(
    unmatched: DataFrame,
    alias_df: DataFrame,
    surface_col: str = "surface",
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    mention_key: tuple[str, ...] = ("doc_id", "seg_id", "tok_begin"),
) -> DataFrame:
    """G3: LSH-block unmatched surfaces against the dictionary, verify
    with exact char-3gram Jaccard ≥ threshold, score = weight * jaccard.

    The dictionary side is tiny → its banded form is broadcast; the
    mention side computes band keys via :func:`lsh_band_keys` (lanes as
    data — O(1) codegen, map-side-combined min; round-2 rewrite of the
    round-1 k-wide unrolled projection that thrashed the JIT code
    cache).  rows = k//bands.
    """
    m_base = unmatched.withColumn("_sh", char_shingles(surface_col))
    mb = lsh_band_keys(
        m_base.select(*mention_key, "_sh"), "_sh", mention_key, k, bands
    ).select(*mention_key, F.col("band").alias("_band"), F.col("key").alias("_key"))
    # join band keys back onto the full mention rows (mention_key is the
    # unique mention identity — same key the top-1 window partitions on)
    m = m_base.join(mb, list(mention_key))

    a_base = alias_df.withColumn("_sh_a", char_shingles("alias"))
    ab = lsh_band_keys(
        a_base.select("alias", "_sh_a").dropDuplicates(["alias"]),
        "_sh_a",
        ["alias"],
        k,
        bands,
    ).select("alias", F.col("band").alias("_band"), F.col("key").alias("_key"))
    a = (
        a_base.join(ab, "alias")
        .select(
            F.col("alias").alias("cand_alias"),
            "entity_id",
            "entity_type",
            "weight",
            "_sh_a",
            "_band",
            "_key",
        )
    )

    cand = (
        m.join(F.broadcast(a), ["_band", "_key"])
        .drop("_band", "_key")
        .dropDuplicates([*mention_key, "entity_id"])
    )
    cand = cand.withColumn("jaccard", jaccard(F.col("_sh"), F.col("_sh_a"))).filter(
        F.col("jaccard") >= threshold
    )
    cand = cand.withColumn("score", F.col("weight") * F.col("jaccard")).drop(
        "_sh", "_sh_a"
    )
    w = Window.partitionBy(*[F.col(c) for c in mention_key]).orderBy(
        F.col("score").desc(), F.col("entity_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def link_mentions(
    mentions: DataFrame,
    alias_df: DataFrame,
    fuzzy: bool = True,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact first; fuzzy only for mentions with no exact hit.

    Returns (doc_id, seg_id, alias, surface, tok_begin, n_toks,
    entity_id, entity_type, score, method).
    """
    cols = [
        "doc_id", "seg_id", "alias", "surface", "tok_begin", "n_toks",
        "entity_id", "entity_type", "score",
    ]
    # Persist: the mention set feeds BOTH the exact join and the anti-join
    # miss detection — without a materialization boundary the upstream
    # (parse→segment→scan UDFs) would recompute per branch, and Spark
    # 4.1's plan-deduplication re-clones the subtree leaving the pandas
    # UDF un-extracted inside a JVM Project (codegen failure).
    from pyspark import StorageLevel

    mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    exact = link_exact(mentions, alias_df).select(*cols).withColumn(
        "method", F.lit("exact")
    )
    if not fuzzy:
        exact._kgc_pinned = [mentions]  # released by kgc.pipeline.release
        return exact
    missed = mentions.join(
        F.broadcast(
            alias_df.select(_norm_alias("alias").alias("alias")).dropDuplicates()
        ),
        "alias",
        "left_anti",
    )
    fz = link_fuzzy(missed, alias_df, threshold=threshold).select(*cols).withColumn(
        "method", F.lit("fuzzy")
    )
    out = exact.unionByName(fz)
    out._kgc_pinned = [mentions]  # released by kgc.pipeline.release
    return out
