#!/usr/bin/env python3
"""Decontamination scale soak (round 9, operators/decontam.py):
GPT-3-style train/eval n-gram overlap flagging at 2M train docs ×
20k eval docs with 10k PLANTED contaminated training docs (each
embeds one eval doc's full text behind a noise prefix).

What it proves at scale:

- accuracy: every planted doc flags (its embedded eval text shares
  all its 8-grams), and the background false-positive rate is exactly
  0 — train and eval draw from DISJOINT synthetic vocabularies, so
  any background hit would be a hash/join bug, not noise;
- cost shape: the eval gram set (~20k docs × ~23 grams = 460k
  xxhash64 longs ≈ 3.7 MB) BROADCASTS — the contamination probe is a
  map-side semi-join over the exploded train grams with zero
  shuffle; the only exchange in the job is the per-doc count
  aggregation, which partial-aggregates map-side. Nothing scales
  with |train| × |eval|. The soak asserts the broadcast is actually
  in the plan (BroadcastHashJoin LeftSemi, no SortMergeJoin/
  CartesianProduct) so a planner regression fails loudly;
- throughput: reported docs/s and gram-rows/s for the full
  annotate-everything pass;
- span policy (round 10): decontaminate_spans must return every
  planted doc as EXACTLY its 3-word noise prefix (the embedded eval
  text is the union of hit windows; boundary-straddling grams
  correctly miss) and must not touch a single background word — the
  expected prefix is re-synthesized in-plan, so the equality check
  covers all 10k planted docs with zero collects.

Docs are synthesized deterministically from xxhash64 (the
soak_semdedup.py pattern) so the run is reproducible without
fixtures.

Usage: python soak_decontam.py [n_train] [n_eval] [n_planted]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.decontam import decontaminate
from timescale_cdc_spark.session import get_spark

DOC_WORDS = 30
NGRAM = 8
TRAIN_VOCAB = 500_000
EVAL_VOCAB = 50_000


def _words(prefix: str, id_col, n_words: int, vocab: int, salt: str):
    """Deterministic n_words-word text: '<prefix><h>' tokens keyed by
    (doc id, position, salt)."""
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(n_words)),
            lambda i: F.concat(
                F.lit(prefix),
                F.pmod(F.xxhash64(id_col, i, F.lit(salt)), F.lit(vocab)).cast(
                    "string"
                ),
            ),
        ),
    )


def synth(spark, n_train: int, n_eval: int, n_planted: int):
    """Eval docs use the 'e' vocabulary; train docs the disjoint 'w'
    vocabulary, except ids < n_planted which embed eval doc (id mod
    n_eval)'s full text behind a 3-word noise prefix."""
    eval_df = spark.range(n_eval).select(
        F.col("id").alias("doc_id"),
        _words("e", F.col("id"), DOC_WORDS, EVAL_VOCAB, "ev").alias("text"),
    )
    planted_src = F.col("id") % n_eval
    train = spark.range(n_train).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_planted,
            F.concat(
                _words("w", F.col("id"), 3, TRAIN_VOCAB, "px"),
                F.lit(" "),
                _words("e", planted_src, DOC_WORDS, EVAL_VOCAB, "ev"),
            ),
        )
        .otherwise(
            _words("w", F.col("id"), DOC_WORDS, TRAIN_VOCAB, "tr")
        )
        .alias("text"),
    )
    return train, eval_df


def main() -> None:
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_planted = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark(app_name="soak_decontam")

    # Materialize the synthetic corpus to scratch parquet first: at
    # real scale the corpus comes from storage, so the timed pass
    # measures the OPERATOR (explode → probe → count), not the
    # 30-term-concat synthesis expression.
    import os
    import tempfile

    scratch = os.path.join(
        tempfile.gettempdir(), f"soak_decontam_{os.getpid()}"
    )
    train_raw, eval_raw = synth(spark, n_train, n_eval, n_planted)
    train_raw.write.mode("overwrite").parquet(f"{scratch}/train")
    eval_raw.write.mode("overwrite").parquet(f"{scratch}/eval")
    train = spark.read.parquet(f"{scratch}/train")
    eval_df = spark.read.parquet(f"{scratch}/eval")
    out = decontaminate(
        train, eval_df, "text", "doc_id", n=NGRAM, min_hits=1, hashed=True
    )

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, (
        "eval gram probe must broadcast"
    )

    t0 = time.perf_counter()
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("contaminated").cast("long")).alias("n_flagged"),
        F.sum(
            (F.col("contaminated") & (F.col("doc_id") >= n_planted)).cast(
                "long"
            )
        ).alias("false_pos"),
        F.sum(
            ((~F.col("contaminated")) & (F.col("doc_id") < n_planted)).cast(
                "long"
            )
        ).alias("false_neg"),
        F.sum("n_grams").alias("gram_rows"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    assert agg["n"] == n_train
    assert agg["false_pos"] == 0, agg
    assert agg["false_neg"] == 0, agg
    assert agg["n_flagged"] == n_planted

    # Span phase (round 10, operators/decontam.py::decontaminate_spans
    # — the Dolma/Llama-3 policy): every planted doc must come back as
    # EXACTLY its 3-word noise prefix (the embedded eval text is the
    # union of hit [pos, pos+n) windows: positions 3..33 all covered,
    # the boundary-straddling grams contain 'w'-vocab words and
    # correctly do NOT hit), and NO background doc may lose a word.
    # The expected prefix is re-synthesized in-plan, so the check is
    # exact string equality on 10k docs with zero collects.
    from timescale_cdc_spark.operators.decontam import decontaminate_spans

    spans = decontaminate_spans(
        train, eval_df, "text", "doc_id", n=NGRAM, hashed=True
    )
    plan2 = spans._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "BroadcastHashJoin" in plan2 and "LeftSemi" in plan2, (
        "span probe must broadcast"
    )
    t0 = time.perf_counter()
    expected_prefix = _words("w", F.col("doc_id"), 3, TRAIN_VOCAB, "px")
    sagg = spans.agg(
        F.sum(
            (
                (F.col("doc_id") < n_planted)
                & (F.col("clean_text") == expected_prefix)
                & (F.col("n_removed_words") == DOC_WORDS)
                & F.col("contaminated")
            ).cast("long")
        ).alias("planted_exact"),
        F.sum(
            (
                (F.col("doc_id") >= n_planted)
                & (
                    (F.col("clean_text") != F.col("text"))
                    | (F.col("n_removed_words") != 0)
                )
            ).cast("long")
        ).alias("bg_touched"),
    ).collect()[0]
    span_wall = time.perf_counter() - t0
    assert sagg["planted_exact"] == n_planted, sagg
    assert sagg["bg_touched"] == 0, sagg

    print(
        json.dumps(
            {
                "metric": "decontam_soak",
                "n_train": n_train,
                "n_eval": n_eval,
                "n_planted": n_planted,
                "flagged": agg["n_flagged"],
                "false_pos": agg["false_pos"],
                "false_neg": agg["false_neg"],
                "gram_rows": agg["gram_rows"],
                "wall_s": round(wall, 2),
                "docs_per_s": round(n_train / wall),
                "gram_rows_per_s": round(agg["gram_rows"] / wall),
                "span_planted_exact": sagg["planted_exact"],
                "span_bg_touched": sagg["bg_touched"],
                "span_wall_s": round(span_wall, 2),
                "span_docs_per_s": round(n_train / span_wall),
            }
        )
    )

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
