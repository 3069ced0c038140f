#!/usr/bin/env python3
"""Round 16 (VERDICT r15 #6): re-measure c3_embedding_dup_pairs'
payload-through-join tradeoff at a scale where the VECTOR SHUFFLE
dominates the fixed join overhead (the r15 A/B at sf0.1 was
fixed-overhead-bound; all three variants measured <= parity there).

Synthetic deterministic corpus: N vectors x 64 dims derived from
xxhash64(id, dim) scaled to [-1, 1); every 100th id is an exact copy
of its predecessor (planted dup pairs, cos = 1.0). Variants:

  A (shipped): bands carry the vector through both join sides, pair
     dedup via dropDuplicates over (id, id, va, vb) rows;
  B (id-only + attach): bands carry ids only; the candidate id-pair
     set is deduped small, then the vectors are attached with two
     shuffle-hash joins against the corpus and verified exactly.

Identity check first (exceptAll both ways), then interleaved
min/median of N_REPS alternating runs, noop-sink timing (guide
§1.4). One JSON line for SCALE.md.

Usage: python3 profile_c3_scale.py [n_vecs] [reps] [num_planes] [chunks]

num_planes defaults to 64 (16-bit bands): per the operator's own
docstring, width is the knob that keeps buckets small as n grows —
the entry's 32-plane/8-bit default is sized for the sf corpus
(~20k vectors) and yields ~10^9 candidate pairs at n=1M.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from timescale_cdc_spark.operators.similarity import (  # noqa: E402
    _hyperplanes,
    cosine,
    embedding_dup_pairs,
    sketch_bits,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

DIM = 64


def corpus_df(spark, n: int) -> DataFrame:
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            # every 100th vector copies its predecessor -> planted dups
            "transform(sequence(0, 63), d -> "
            "cast(xxhash64(CASE WHEN id % 100 = 0 AND id > 0 "
            "THEN id - 1 ELSE id END, d) % 1000000 as double) / 1000000.0"
            ")"
        ).alias("embedding"),
    )
    return base


def variant_b(
    df: DataFrame,
    threshold: float = 0.99,
    num_planes: int = 32,
    chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """id-only bands + attach-vectors-after-dedup (the r15 variant
    (a), rebuilt verbatim against the current operator internals)."""
    planes = _hyperplanes(num_planes, DIM, seed)
    width = num_planes // chunks
    sk = df.select(
        F.col("vec_id").alias("_id"),
        sketch_bits("embedding", planes).alias("_fp"),
    )
    banded = sk.select(
        "_id",
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
    ).select("_id", "ck.chunk", "ck.key")
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b").hint("shuffle_hash")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    ).hint("shuffle_hash")
    vb = df.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    ).hint("shuffle_hash")
    attached = pairs.join(va, "id_a").join(vb, "id_b")
    return (
        attached.withColumn("cos", F.round(cosine("va", "vb"), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    planes = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    spark = get_spark(app_name="profile_c3_scale")
    spark.sparkContext.setJobDescription(
        f"c3 scale A/B n={n} planes={planes} chunks={chunks}"
    )
    corpus = corpus_df(spark, n).localCheckpoint()  # source cost excluded

    def mk_a():
        return embedding_dup_pairs(
            corpus, threshold=0.99, num_planes=planes, chunks=chunks
        )

    def mk_b():
        return variant_b(
            corpus, threshold=0.99, num_planes=planes, chunks=chunks
        )

    va = mk_a()
    vb = mk_b()
    d1 = va.exceptAll(vb).count()
    d2 = vb.exceptAll(va).count()
    npairs = va.count()
    print(f"identity: pairs={npairs} exceptAll {d1}/{d2}", flush=True)
    assert d1 == 0 and d2 == 0

    res = {"A_payload_through_join": [], "B_idonly_attach": []}
    # warm both
    noop(mk_a())
    noop(mk_b())
    for _ in range(reps):
        for tag, fn in (
            ("A_payload_through_join", mk_a),
            ("B_idonly_attach", mk_b),
        ):
            t0 = time.perf_counter()
            noop(fn())
            res[tag].append(round(time.perf_counter() - t0, 3))
    out = {
        "probe": "c3_embedding_payload_vs_idonly",
        "n_vecs": n,
        "dim": DIM,
        "num_planes": planes,
        "chunks": chunks,
        "pairs": npairs,
        **{
            k: {"min": min(v), "med": statistics.median(v), "all": v}
            for k, v in res.items()
        },
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
