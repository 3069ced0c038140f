#!/usr/bin/env python3
"""Exact-substring-dedup scale soak (round 11, VERDICT r10 #1,
operators/decontam.py::dedup_substrings — the Lee et al. 2022
EXACTSUBSTR recipe): corpus-internal duplicated-span removal at 2M
documents with 10k PLANTED duplicated-span pairs.

What it proves at scale:

- accuracy: every planted pair shares one embedded span behind
  per-doc noise prefixes — BOTH members must come back as exactly
  their own prefix + suffix (the shared span is the union of hit
  windows; boundary-straddling grams draw on per-doc noise words and
  correctly miss), and the 2M-doc background — drawn from a huge
  vocabulary keyed by (doc, position) so no n-gram repeats across
  docs — must not lose a single word. The expected surviving text is
  re-synthesized in-plan, so the equality covers every doc with zero
  collects;
- cost shape: unlike decontamination there is NO broadcast-small
  side — the gram frequency table is corpus-sized. The plan must be
  gram-bucketed joins only: the soak asserts no CartesianProduct and
  no BroadcastNestedLoopJoin anywhere, and that the duplicated-gram
  semi-join keys on the gram column. Everything scales as two
  gram-keyed exchanges + one per-doc collect_set, never all-pairs;
- throughput: docs/s and gram-rows/s for the full remove-all pass.

Docs are synthesized deterministically from xxhash64 (the
soak_decontam.py pattern) so the run is reproducible without
fixtures.

Usage: python soak_substr.py [n_docs] [n_pairs]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.decontam import dedup_substrings
from timescale_cdc_spark.session import get_spark

PREFIX_WORDS = 3
SUFFIX_WORDS = 4
SPAN_WORDS = 12
DOC_WORDS = 30
NGRAM = 8
VOCAB = 2_000_000


def _words(prefix: str, id_col, n_words: int, salt: str):
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(n_words)),
            lambda i: F.concat(
                F.lit(prefix),
                F.pmod(
                    F.xxhash64(id_col, i, F.lit(salt)), F.lit(VOCAB)
                ).cast("string"),
            ),
        ),
    )


def synth(spark, n_docs: int, n_pairs: int):
    """ids < 2*n_pairs: planted pair members — pair p = ids (2p,
    2p+1), each 'prefix + SHARED span(p) + suffix' with per-doc
    prefix/suffix noise; the rest: background docs whose words are
    keyed by (doc, position) so no cross-doc n-gram ever repeats."""
    pair = F.floor(F.col("id") / 2) + 50_000_000
    planted = F.col("id") < 2 * n_pairs
    text = F.when(
        planted,
        F.concat(
            _words("n", F.col("id"), PREFIX_WORDS, "px"),
            F.lit(" "),
            _words("s", pair, SPAN_WORDS, "sp"),
            F.lit(" "),
            _words("n", F.col("id"), SUFFIX_WORDS, "sx"),
        ),
    ).otherwise(_words("b", F.col("id"), DOC_WORDS, "bg"))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(app_name="soak_substr")

    import os
    import tempfile

    scratch = os.path.join(
        tempfile.gettempdir(), f"soak_substr_{os.getpid()}"
    )
    synth(spark, n_docs, n_pairs).write.mode("overwrite").parquet(scratch)
    corpus = spark.read.parquet(scratch)

    out = dedup_substrings(
        corpus, "text", "doc_id", n=NGRAM, max_freq=1, hashed=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, "all-pairs plan"
    assert "BroadcastNestedLoopJoin" not in plan, "all-pairs plan"
    assert "_gram" in plan  # the dup-gram probe keys on the gram

    # expected survivors, re-synthesized in-plan: planted docs keep
    # prefix + suffix (shared span cut), background keeps everything
    pair = F.floor(F.col("doc_id") / 2) + 50_000_000
    expected = F.when(
        F.col("doc_id") < 2 * n_pairs,
        F.concat(
            _words("n", F.col("doc_id"), PREFIX_WORDS, "px"),
            F.lit(" "),
            _words("n", F.col("doc_id"), SUFFIX_WORDS, "sx"),
        ),
    ).otherwise(F.col("text"))

    t0 = time.perf_counter()
    row = out.agg(
        F.sum((F.col("clean_text") != expected).cast("int")).alias("bad"),
        F.sum(F.col("duplicated").cast("int")).alias("flagged"),
    ).collect()[0]
    bad, n_flagged = row["bad"], row["flagged"]
    wall = time.perf_counter() - t0

    gram_rows = n_docs * (DOC_WORDS - NGRAM + 1)
    report = {
        "n_docs": n_docs,
        "n_planted_pairs": n_pairs,
        "wrong_survivor_docs": bad,
        "flagged_docs": n_flagged,
        "expected_flagged": 2 * n_pairs,
        "wall_s": round(wall, 2),
        "docs_per_s": int(n_docs / wall),
        "gram_rows_per_s": int(gram_rows / wall),
        "plan_gram_bucketed": True,
    }
    print(json.dumps(report))
    assert bad == 0, report
    assert n_flagged == 2 * n_pairs, report

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
