#!/usr/bin/env python3
"""Hot-key skew soak (VERDICT r3 #1/#3): planted degenerate keys at
10k document frequency — the quadratic blowups the caps exist for.

Scenario A (n-gram Jaccard): a boilerplate shingle shared by 10k docs.
Uncapped, that ONE shingle contributes ~5e7 join rows in ONE task
(the shuffle key is the shingle). With ``max_df`` the shingle never
enters the blocking join; surviving pairs keep EXACT Jaccard.

Scenario B (MinHash-LSH / SimHash): a 10k-doc identical cluster.
Every band bucket holds the whole cluster → one task emits O(f²)
pairs per band uncapped. With ``max_bucket`` hot buckets emit O(f)
star pairs that still connect the cluster.

Prints one JSON line with wall times, candidate counts, and
planted-pair recall with/without the caps (recall on NORMAL pairs
must be identical).

Usage: python soak_hotkey.py [n_normal] [n_hot] [--skip-uncapped]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from timescale_cdc_spark.session import get_spark


def synth_docs(spark, n: int):
    """Deterministic ~40-word docs; ids % 100 == 0 get a near-copy at
    id + n with one word appended (the planted normal pairs)."""
    words_per_doc = 40
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(5000)).cast(
                        "string"
                    ),
                )
                for k in range(words_per_doc)
            ],
        ).alias("text"),
    )
    near = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
    )
    return base.unionByName(near)


def planted_recall(pairs, n_normal: int) -> float:
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == n_normal)
        & (F.col("id_a") % 100 == 0)
        & (F.col("id_a") < n_normal)
    ).count()
    return found / (n_normal // 100)


def main() -> None:
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    run_uncapped = "--skip-uncapped" not in sys.argv
    spark = get_spark(app_name="soak_hotkey")
    out: dict = {"n_normal": n_normal, "n_hot": n_hot}

    normal = synth_docs(spark, n_normal)

    # Scenario A: one boilerplate shingle in n_hot docs (prepended, so
    # each hot doc contributes the SAME 3-gram once plus unique tail).
    boiler_docs = spark.range(n_hot).select(
        (F.col("id") + 5_000_000).alias("doc_id"),
        F.concat(
            F.lit("click here now "),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("t"),
                        F.pmod(
                            F.xxhash64(F.col("id"), F.lit(100 + k)),
                            F.lit(5_000_000),
                        ).cast("string"),
                    )
                    for k in range(20)
                ],
            ),
        ).alias("text"),
    )
    corpus_a = normal.unionByName(boiler_docs).persist()
    corpus_a.count()

    # candidate-pair counts: blocking-join size with vs without the cap
    exploded = corpus_a.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    )
    dfreq = exploded.groupBy("shingle").agg(F.count("*").alias("c"))
    out["ngram_max_shingle_df"] = dfreq.agg(F.max("c")).collect()[0][0]
    rare = exploded.join(dfreq.filter(F.col("c") <= 100), "shingle")
    out["ngram_candidates_capped"] = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    # uncapped candidate count = capped + hot-shingle fan-out, computed
    # analytically per hot shingle (sum df*(df-1)/2 upper bound) so the
    # soak itself never materializes the blowup
    hot_fanout = (
        dfreq.filter(F.col("c") > 100)
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2))
        .collect()[0][0]
    )
    out["ngram_hot_fanout_upper_bound"] = int(hot_fanout or 0)

    t0 = time.perf_counter()
    capped = ngram_jaccard_pairs(
        corpus_a, "text", "doc_id", threshold=0.8, max_df=100
    ).persist()
    out["ngram_capped_pairs"] = capped.count()
    out["ngram_capped_sec"] = round(time.perf_counter() - t0, 2)
    out["ngram_capped_recall"] = planted_recall(capped, n_normal)

    if run_uncapped:
        t0 = time.perf_counter()
        unc = ngram_jaccard_pairs(corpus_a, "text", "doc_id", threshold=0.8)
        out["ngram_uncapped_pairs"] = unc.count()
        out["ngram_uncapped_sec"] = round(time.perf_counter() - t0, 2)
    corpus_a.unpersist()

    # Scenario B: identical 10k-doc cluster
    spam = spark.range(n_hot).select(
        (F.col("id") + 5_000_000).alias("doc_id"),
        F.lit("limited offer act now before the deal expires forever today").alias(
            "text"
        ),
    )
    corpus_b = normal.unionByName(spam).persist()
    corpus_b.count()

    for name, fn, kw in (
        ("minhash", minhash_lsh_pairs, {"threshold": 0.5}),
        ("simhash", simhash_pairs, {"max_hamming": 3}),
    ):
        t0 = time.perf_counter()
        cp = fn(corpus_b, "text", "doc_id", max_bucket=256, **kw).persist()
        out[f"{name}_capped_pairs"] = cp.count()
        out[f"{name}_capped_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{name}_capped_recall"] = planted_recall(cp, n_normal)
        # the hot cluster must still be fully connected: star pairs
        # rooted at the cluster minimum cover every member
        cluster_nodes = (
            cp.filter(F.col("id_b") >= 5_000_000)
        ).select("id_b").distinct().count()
        out[f"{name}_cluster_coverage"] = (cluster_nodes + 1) / n_hot
        cp.unpersist()
    corpus_b.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
