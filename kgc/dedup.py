"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Training-corpus dedup is the single most shuffle-heavy stage of a
100 TB pipeline; every operator here is built so the wide exchange
happens on a *uniform* key (md5 group keys, LSH band hashes, simhash
bands) — no skew by construction — and the candidate set is blocked
BEFORE any pairwise verification, so the quadratic step only ever runs
inside tiny buckets.

All hashing is md5-based so each operator has a bit-identical ANSI-SQL
twin for the DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgc.link import jaccard, lsh_bands, minhash_signature, token_shingles


# ------------------------------------------------------------- exact ------
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: (doc_id, dup_group, group_size,
    is_canonical).  Canonical = min doc_id per group (deterministic).

    One shuffle on md5(text) — uniformly distributed.  Only groups with
    >1 member survive; at corpus scale add a pre-aggregation count
    filter so singleton groups never leave the map side (done here via
    the window-free two-pass groupBy, which Spark partial-aggregates).
    """
    h = df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("dup_group")
    )
    groups = h.groupBy("dup_group").agg(
        F.count(F.lit(1)).alias("group_size"), F.min("doc_id").alias("canonical_id")
    ).filter(F.col("group_size") > 1)
    return h.join(groups, "dup_group").select(
        "doc_id",
        "dup_group",
        "group_size",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


# ----------------------------------------------------------- minhash ------
def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: (a, b, jaccard) with a < b.

    shingle → k-lane minhash → band → self-join on (band, key) →
    exact-Jaccard verify.  The self-join shuffles once on the band
    hash; dropDuplicates on the pair collapses multi-band collisions
    before the (cheap) verification.
    """
    from pyspark import StorageLevel

    rows = k // bands
    # three-projection chain: toks → shingles → lanes/bands.  Each hop's
    # output is referenced ≥2 times downstream, which stops
    # CollapseProject from inlining the expensive child into the next
    # stage (see kgc.link.minhash_signature).  The shingle table is
    # persisted: it feeds both the band computation and the pairwise
    # verification join.
    from kgc.link import shingles_from_tokens
    from kgc.textops import norm_tokens

    sh = (
        df.select(
            F.col(id_col).alias("doc_id"), norm_tokens(text_col).alias("_toks")
        )
        .select(
            "doc_id", "_toks", shingles_from_tokens(F.col("_toks"), shingle_n).alias("sh")
        )
        .select("doc_id", "sh")
        .filter(F.size("sh") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # band keys only — the heavy shingle arrays do NOT ride the shuffle.
    # sig lands in its own projection (8 downstream refs → no inline),
    # so the k-lane minhash is computed exactly once per row.
    sigd = sh.select("doc_id", minhash_signature(F.col("sh"), k).alias("sig"))
    banded = sigd.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # verify candidates with exact Jaccard — shingles re-join from cache
    sh_a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(sh_a, "a")
        .join(sh_b, "b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (a, b) pairs — the
    verification primitive, usable after any blocking scheme."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    return (
        candidate_pairs.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a", "b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard")
        )
    )


# ----------------------------------------------------------- simhash ------
def _tok_hash60(tok: Column) -> Column:
    """First 15 hex chars of md5 → 60-bit non-negative bigint.

    15 (not 16) hex chars so the value fits signed int64 in BOTH Spark
    and DuckDB without overflow — engine-portable bit arithmetic.
    """
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")


def simhash60(col: Column | str) -> Column:
    """60-bit SimHash over word tokens (Charikar 2002).

    bit_b(doc) = majority vote of bit_b over all token hashes.  The
    per-bit tally is an aggregate over the token array — pure Catalyst,
    no UDF; 60 shifts on a bigint per token, all codegen'd.
    """
    from kgc.textops import norm_tokens

    toks = norm_tokens(col)
    n = F.size(toks)
    # hash each token ONCE, then 60 cheap bit-tallies over the hashed
    # array (not 60 md5 passes) — the md5 is the expensive part.  Bit
    # positions are compile-time constants (shiftright takes a Python
    # int), so the 60 lanes unroll into one codegen'd projection.
    hashed = F.transform(toks, _tok_hash60)

    def _tally(b: int):
        # closure-bind b OUTSIDE the lambda: pyspark derives the lambda
        # arity from the signature, so a `b=b` default would become a
        # third (unresolved) lambda variable.
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = [
        F.when(
            F.aggregate(hashed, F.lit(0).cast("bigint"), _tally(b)) > 0,
            F.lit(1 << b).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for b in range(60)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return F.when(n > 0, total).otherwise(F.lit(0).cast("bigint"))


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """DataFrame-level simhash with projection barriers: tokens →
    hashed (md5 once per token) → 60 bit-tallies.  Each intermediate
    is referenced ≥2 times by the next projection, so CollapseProject
    keeps the stages separate and nothing re-evaluates.  Prefer this
    over the raw ``simhash60`` column on large scans."""
    from kgc.textops import norm_tokens

    keep = df.columns
    t = df.select(*keep, norm_tokens(text_col).alias("_toks"))
    h = t.select(
        *keep, "_toks", F.transform(F.col("_toks"), _tok_hash60).alias("_hashed")
    )

    def _tally(b: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = [
        F.when(
            F.aggregate(F.col("_hashed"), F.lit(0).cast("bigint"), _tally(b)) > 0,
            F.lit(1 << b).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for b in range(60)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return h.select(
        *keep,
        F.when(F.size("_toks") > 0, total).otherwise(F.lit(0).cast("bigint")).alias(out_col),
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: (a, b, hamming ≤ max_hamming).

    Blocking: split the 60-bit hash into ``bands`` 15-bit bands; by
    pigeonhole any pair within hamming ≤ bands-1 shares ≥1 exact band →
    equi-join per band, then verify true hamming with bit_count(xor).
    """
    from pyspark import StorageLevel

    width = 60 // bands
    # persisted: the banded self-join reads this twice
    sh = (
        with_simhash(
            df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
            "text",
            "h",
        )
        .select("doc_id", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    banded = sh.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.shiftright(F.col("h"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "h", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.h").alias("ha"),
            F.col("y.h").alias("hb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------- embeddings ----
def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed in
    double with left-to-right summation (engine-portable order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH + cosine verify.

    Signature bit i = sign(v · h_i) with hyperplane components h_i[j] ∈
    {−1,+1} derived from md5(i|j) — deterministic, engine-portable, no
    stored model.  Pairs sharing the full 16-bit sketch are candidates
    (for near-DUPLICATES the sketch collides with very high
    probability); verified with exact cosine ≥ threshold.
    """
    from pyspark import StorageLevel

    sig = hyperplane_signature(F.col(vec_col), planes)
    # persist: both sides of the self-join read s — without the
    # materialization each side recomputes the signature scan.
    s = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("sig")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        s.alias("x")
        .join(s.alias("y"), "sig")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.round(cosine(F.col("x.v"), F.col("y.v")), 6).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def _plane_sign(i: int, j: int) -> float:
    """Hyperplane component h_i[j] ∈ {−1,+1} from md5(i|j).

    Same formula the DuckDB oracle evaluates in SQL — but since it is
    data-independent, Spark gets it as a plan-time LITERAL (hashlib md5
    == engine md5), so the scan runs zero md5 calls."""
    import hashlib

    return 1.0 if hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0] < "8" else -1.0


def hyperplane_signature(vec: Column, planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane sketch as a bigint: bit i = 1 iff v·h_i > 0.

    ``dim`` must cover the vector length (extra literals are ignored by
    zip_with's null-padding → 0 contribution)."""

    def dot_plane(i: int) -> Column:
        signs = F.array(*[F.lit(_plane_sign(i, j)) for j in range(dim)])
        prods = F.zip_with(
            vec, signs, lambda x, h: F.coalesce(x.cast("double") * h, F.lit(0.0))
        )
        return F.aggregate(prods, F.lit(0.0), lambda a, v: a + v)

    total = F.lit(0).cast("bigint")
    for i in range(planes):
        total = total + F.when(
            dot_plane(i) > 0, F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return total
