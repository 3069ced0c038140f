"""Deduplication operators (SURVEY.md §2 C1/C2) — exact, MinHash-LSH,
SimHash, and n-gram Jaccard near-dup detection over a document column.

Scale design (the whole point of these shapes):
- Exact dedup is a hash aggregate — one shuffle on the content hash.
- Near-dup NEVER does all-pairs. MinHash-LSH shuffles O(docs × bands)
  tiny band keys; only same-bucket candidates are verified. SimHash
  bands 64 bits into chunks the same way. All signature math is
  built-in Spark expressions (xxhash64, transform, aggregate) — fully
  whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """C1 exact dedup: keep the lowest-id row per identical content.

    Uses a sha2-256 content hash as the shuffle key (cheap, fixed
    width, collision-safe at any scale) + keep-first window.
    """
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    words = F.split(F.col(text_col), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def minhash_signature(shingles: F.Column, num_hashes: int = 64) -> F.Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(seed_i || shingle). One nested transform — no UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """C2 MinHash-LSH near-dup pairs.

    shingle → 64-hash MinHash signature → 16 bands × 4 rows; docs
    sharing any band bucket become candidates; candidates are verified
    with the *estimated* Jaccard (matching signature fraction). Returns
    (id_a, id_b, jaccard_est) with id_a < id_b.

    At 100 TB: the band explode emits |docs|×bands small rows; the
    bucket self-join only materializes same-bucket groups. The LSH
    S-curve (b=16, r=4 → threshold ≈ (1/16)^(1/4) ≈ 0.5) bounds the
    candidate count.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(word_shingles(text_col, shingle_n), num_hashes).alias(
            "_sig"
        ),
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jaccard_est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(float(num_hashes))
    )
    return (
        cand.withColumn("jaccard_est", jaccard_est)
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """C2 exact n-gram Jaccard near-dup pairs, shingle-blocked.

    Candidates = pairs sharing ≥1 shingle (explode + equi-join on the
    shingle — the blocking key), then exact |∩|/|∪| on distinct
    shingle sets. Oracle-testable (plain SQL). The blocking join is
    the scalable skeleton; at extreme scale rare-shingle sampling
    bounds fan-out of ubiquitous shingles.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_n).alias("_sh"),
    )
    exploded = sh.select("_id", F.explode("_sh").alias("shingle"))
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sb = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    from timescale_cdc_spark.operators.text import trunc6

    return verified.select("id_a", "id_b", trunc6(F.col("jaccard")).alias("jaccard"))


def simhash64(text_col: str) -> F.Column:
    """64-bit SimHash of whitespace tokens: per-token xxhash64, each
    bit votes ±1, sign of the vote is the fingerprint bit. Built as a
    single aggregate over a zip_with — all codegen."""
    tokens = F.split(F.col(text_col), r"\s+")
    hashes = F.transform(tokens, lambda w: F.xxhash64(w))
    # Bit positions are Python ints (shiftright/shiftleft require a
    # literal shift amount), so the 64-lane vote vector is built by
    # comprehension — still one codegen'd expression tree.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for j in range(64)
                ]
            ),
            lambda a, v: a + v.cast("long"),
        ),
    )
    # Pack sign bits with ONE zip_with against a powers-of-two array
    # (referencing `votes` once — 64 chained ORs would duplicate the
    # aggregate subtree 64×). Bit 63 is the sign bit: 1<<63 as signed
    # long is Long.MIN_VALUE.
    powers = F.array(
        *[
            F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")
            for j in range(64)
        ]
    )
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, bit: acc.bitwiseOR(bit),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """C2 SimHash near-dup pairs: fingerprint, band the 64 bits into
    ``chunks`` 16-bit keys (pigeonhole: hamming ≤ 3 ⇒ at least one of
    4 chunks identical), equi-join per chunk, verify hamming via
    bit_count(xor). Returns (id_a, id_b, hamming)."""
    fp = df.select(
        F.col(id_col).alias("_id"), simhash64(text_col).alias("_fp")
    )
    width = 64 // chunks
    banded = fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("_fp"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("_id", "_fp", "ck.chunk", "ck.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._fp").alias("fp_a"),
            F.col("b._fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
