"""Profile the c2_minhash_simhash registered query's components at a
given SF dir — the headline bench's most expensive entry. Run:

    python examples/profile_c2.py [sf_dir] [runs]

Prints per-component wall-clock (min over runs after a warmup) so
optimization work targets the real hot spot instead of guesses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.dedup import (
    minhash_banded,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_pairs,
    word_shingles,
)
from timescale_cdc_spark.queries import QUERIES
from timescale_cdc_spark.queries.llm_queries import (
    SKETCH_MAX_BUCKET,
    _planted_docs,
)
from timescale_cdc_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    corpus = _planted_docs(spark, sf_dir)

    def timed(label, thunk):
        times = []
        for _ in range(runs):
            t0 = time.time()
            n = thunk()
            times.append(time.time() - t0)
        print(f"{label:32s} min={min(times):7.3f}s  all={[round(t,2) for t in times]}  n={n}")

    timed("corpus.count", corpus.count)
    timed(
        "minhash_signatures",
        lambda: minhash_signatures(corpus, "text", "doc_id").count(),
    )
    timed(
        "minhash_banded",
        lambda: minhash_banded(corpus, "text", "doc_id").count(),
    )
    timed(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(
            corpus, "text", "doc_id", threshold=0.5,
            max_bucket=SKETCH_MAX_BUCKET,
        ).count(),
    )
    timed(
        "simhash_fingerprints",
        lambda: simhash_fingerprints(corpus, "text", "doc_id").count(),
    )
    timed(
        "simhash_pairs",
        lambda: simhash_pairs(
            corpus, "text", "doc_id", max_hamming=3,
            max_bucket=SKETCH_MAX_BUCKET,
        ).count(),
    )
    feats = corpus.select(
        F.col("doc_id"),
        word_shingles("text", 3).alias("sh"),
        F.array_distinct(F.split("text", r"\s+")).alias("tk"),
    )
    timed("feats (shingles+tokens)", feats.count)
    timed(
        "FULL c2_minhash_simhash",
        lambda: QUERIES["c2_minhash_simhash"](spark, sf_dir).count(),
    )


if __name__ == "__main__":
    main()
