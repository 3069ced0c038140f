#!/usr/bin/env python3
"""Composed-curation soak (VERDICT r6 #7): run the FULL
curate(transitive=True) → connected-components → sequence-packing
flow at the 101k-doc hot-cluster scale the standalone soaks use —
pinning the interaction between the pieces, not each piece alone.

Corpus: n_normal unique docs, 1% of them with a planted near-copy
(chained a~b~c triples every 1000 ids so transitive resolution has
real work), plus one n_hot identical hot cluster (the skew case the
LSH bucket cap exists for).

Invariants checked in-run:
- the hot cluster keeps EXACTLY its minimum id (CC canonical);
- every planted chain keeps only its minimum (transitive semantics —
  the single-pass star approximation would keep 2 of 3 on chains
  where the middle doc bridges the ends);
- pack budgets hold exactly (assign_packs_exact) over survivors.

Phase 2 (round 10) composes the FILTER stages at the same scale —
redact + perplexity + decontamination over the base corpus with one
planted group per stage (PII twin pairs that must collapse post-
redaction, OOV docs that must drop at the perplexity stage under a
score-derived ceiling, eval-embedding docs that must drop as
contaminated) and zero tolerated base-corpus false drops.

Prints one JSON line with stage wall-times and counts for SCALE.md.

Usage: python soak_curate.py [n_normal] [n_hot]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.curation import curate, curation_report
from timescale_cdc_spark.operators.packing import assign_packs_exact
from timescale_cdc_spark.session import get_spark


def synth_corpus(spark, n_normal: int, n_hot: int):
    """Deterministic ~40-word docs. Every 1000th id i spawns a chain:
    i ~ i+offset (one word changed) ~ i+2*offset (two words changed) —
    i and i+offset pair, i+offset and i+2*offset pair, but i and
    i+2*offset may not (the transitive case). Ids >= hot_base are one
    identical cluster."""
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(5000)).cast(
                "string"
            ),
        )
        for k in range(40)
    ]
    base = spark.range(n_normal).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    chain_roots = base.filter(F.col("doc_id") % 1000 == 0)
    mid = chain_roots.select(
        (F.col("doc_id") + n_normal).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailone")).alias("text"),
    )
    end = chain_roots.select(
        (F.col("doc_id") + 2 * n_normal).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailone tailtwo tailthree")).alias(
            "text"
        ),
    )
    hot_base = 10_000_000
    hot_text = "identical hot cluster document body " + " ".join(
        f"hot{k}" for k in range(34)
    )
    hot = spark.range(n_hot).select(
        (F.col("id") + hot_base).alias("doc_id"), F.lit(hot_text).alias("text")
    )
    return base.unionByName(mid).unionByName(end).unionByName(hot), hot_base


def main() -> None:
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(app_name="soak_curate")
    docs, hot_base = synth_corpus(spark, n_normal, n_hot)
    docs = docs.localCheckpoint(eager=True)
    n_docs = docs.count()

    out: dict = {"n_docs": n_docs, "n_normal": n_normal, "n_hot": n_hot}

    t0 = time.time()
    curated = curate(
        docs,
        min_quality=0.0,
        min_tokens=5,
        near_dup_threshold=0.5,
        near_dup_max_bucket=256,
        transitive=True,
    ).localCheckpoint(eager=True)
    out["curate_transitive_sec"] = round(time.time() - t0, 2)

    report = {
        (r["kept"], r["drop_reason"]): r["n_docs"]
        for r in curation_report(curated).collect()
    }
    out["kept"] = report.get((True, None), 0)
    out["dropped_exact"] = report.get((False, "exact_dup"), 0)
    out["dropped_near"] = report.get((False, "near_dup"), 0)

    # invariant 1: hot cluster → exactly its minimum id survives
    # (identical docs collapse via exact dedup; CC would catch any
    # near-variants)
    hot_kept = [
        r.doc_id
        for r in curated.filter(
            (F.col("doc_id") >= hot_base) & F.col("kept")
        ).collect()
    ]
    assert hot_kept == [hot_base], hot_kept[:5]

    # invariant 2: every planted chain keeps ONLY its root (CC
    # minimum). Chain members: root r, r+n_normal, r+2n_normal.
    chain_kept = (
        curated.filter(F.col("kept") & (F.col("doc_id") < 3 * n_normal))
        .select(F.pmod("doc_id", F.lit(n_normal)).alias("r"),
                F.col("doc_id"))
        .filter(F.col("r") % 1000 == 0)
        .groupBy("r")
        .agg(F.collect_list("doc_id").alias("kept_ids"))
        .collect()
    )
    n_chains = n_normal // 1000
    bad = [r for r in chain_kept if sorted(r["kept_ids"]) != [r["r"]]]
    out["chains_total"] = n_chains
    out["chains_resolved_to_root"] = n_chains - len(bad)
    # MinHash misses a borderline pair occasionally; require >= 95%
    # of chains fully collapsed and NONE keeping all three members
    assert len(bad) <= n_chains * 0.05, bad[:5]
    assert not [r for r in bad if len(r["kept_ids"]) >= 3], bad[:5]

    # pack survivors under a strict budget
    t0 = time.time()
    packed = assign_packs_exact(
        curated.filter(F.col("kept")).select("doc_id", "ws_tokens"),
        "ws_tokens", "doc_id", budget=2048,
    ).localCheckpoint(eager=True)
    out["pack_exact_sec"] = round(time.time() - t0, 2)
    pack_stats = packed.groupBy("pack_seq").agg(
        F.sum("ws_tokens").alias("tok")
    )
    out["n_packs"] = pack_stats.count()
    max_tok = pack_stats.agg(F.max("tok")).collect()[0][0]
    out["max_pack_tokens"] = max_tok
    assert max_tok <= 2048  # invariant 3: strict budget holds
    out["pack_fill_avg"] = round(
        pack_stats.agg(F.avg("tok")).collect()[0][0] / 2048, 3
    )

    # ------------------------------------------------------------------
    # Phase 2 (round 10): the FILTER stages at scale — redact +
    # perplexity + decontamination composed with the dedup stages,
    # one planted group per stage over the same base corpus:
    #   * PII twin pairs (unique vocab, same text modulo the leaked
    #     email) — redaction must collapse each pair to its minimum,
    #     the loser dropping as exact_dup;
    #   * OOV docs (disjoint 'z' vocabulary) — must drop as
    #     'perplexity' against a base-fit reference LM;
    #   * contaminated docs (an eval doc's full text behind a 3-word
    #     noise prefix) — must drop as 'contaminated'. Eval (and PII)
    #     docs draw from the BASE vocabulary with different salts so
    #     they pass the perplexity stage and reach their own: shared
    #     words, never shared 8-gram sequences (collision odds
    #     ~5000^-8), so a base doc dropping as contaminated is a bug;
    #   * and ZERO base docs may drop at the ppl/contam stages.
    # The ppl ceiling is derived from observed base-vs-OOV scores.
    def _vocab_words(prefix: str, n_words: int, vocab: int, salt: str):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(prefix),
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(k), F.lit(salt)),
                        F.lit(vocab),
                    ).cast("string"),
                )
                for k in range(n_words)
            ],
        )

    n_pii = max(n_normal // 500, 20)
    n_oov = max(n_normal // 1000, 10)
    n_eval, n_contam = 2000, 1000
    pii_body = _vocab_words("w", 30, 5000, "pii")
    pii_a = spark.range(n_pii).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat(
            pii_body, F.lit(" contact user"), F.col("id").cast("string"),
            F.lit("@example.com"),
        ).alias("text"),
    )
    pii_b = spark.range(n_pii).select(
        (F.col("id") + 21_000_000).alias("doc_id"),
        F.concat(
            pii_body, F.lit(" contact admin"), F.col("id").cast("string"),
            F.lit("@other.org"),
        ).alias("text"),
    )
    oov = spark.range(n_oov).select(
        (F.col("id") + 23_000_000).alias("doc_id"),
        _vocab_words("z", 40, 5000, "oov").alias("text"),
    )
    eval_df = spark.range(n_eval).select(
        F.col("id").alias("doc_id"),
        _vocab_words("w", 30, 5000, "ev").alias("text"),
    ).localCheckpoint(eager=True)
    contam = eval_df.filter(F.col("doc_id") < n_contam).select(
        (F.col("doc_id") + 24_000_000).alias("doc_id"),
        F.concat(
            F.lit("w1 w2 w3 "), F.col("text")
        ).alias("text"),
    )
    corpus2 = (
        docs.unionByName(pii_a).unionByName(pii_b)
        .unionByName(oov).unionByName(contam)
        .localCheckpoint(eager=True)
    )

    from timescale_cdc_spark.operators.text import (
        perplexity_scores,
        unigram_logprobs,
    )

    ppl_ref = docs.filter(F.col("doc_id") % 97 == 0)
    lm, oov_logp = unigram_logprobs(ppl_ref, "text")
    probe = perplexity_scores(
        docs.filter(F.col("doc_id") % 101 == 0).unionByName(oov),
        lm, oov_logp, "text", "doc_id",
    ).select(
        (F.col("doc_id") >= 23_000_000).alias("is_oov"), "ppl"
    ).groupBy("is_oov").agg(
        F.max("ppl").alias("hi"), F.min("ppl").alias("lo")
    ).collect()
    bands = {r["is_oov"]: r for r in probe}
    assert bands[False]["hi"] < bands[True]["lo"], bands
    ceiling = (bands[False]["hi"] * bands[True]["lo"]) ** 0.5

    t0 = time.time()
    curated2 = curate(
        corpus2,
        min_quality=0.0,
        min_tokens=5,
        near_dup_threshold=0.5,
        near_dup_max_bucket=256,
        redact=True,
        ppl_ref=ppl_ref,
        max_ppl=ceiling,
        eval_docs=eval_df,
        decontam_n=8,
    ).localCheckpoint(eager=True)
    out["stage_soak_sec"] = round(time.time() - t0, 2)

    byreason = {
        (r["lo"], r["reason"]): r["n"]
        for r in curated2.select(
            (F.floor(F.col("doc_id") / 1_000_000) * 1_000_000).alias("lo"),
            F.coalesce("drop_reason", F.lit("kept")).alias("reason"),
        ).groupBy("lo", "reason").agg(F.count("*").alias("n")).collect()
    }
    # PII pairs: every low twin kept, every high twin an exact dup
    assert byreason.get((20_000_000, "kept")) == n_pii, byreason
    assert byreason.get((21_000_000, "exact_dup")) == n_pii, byreason
    # OOV docs: all drop at the perplexity stage
    assert byreason.get((23_000_000, "perplexity")) == n_oov, byreason
    # contaminated docs: all drop at the decontamination stage
    assert byreason.get((24_000_000, "contaminated")) == n_contam, byreason
    # and the base corpus never trips the new filters
    base_reasons = {
        k[1] for k in byreason if k[0] < 20_000_000
    }
    assert "perplexity" not in base_reasons, byreason
    assert "contaminated" not in base_reasons, byreason
    out["stage_soak"] = {
        "n_pii_pairs": n_pii, "n_oov": n_oov, "n_contam": n_contam,
        "pii_pairs_collapsed": byreason.get((21_000_000, "exact_dup"), 0),
        "oov_dropped_ppl": byreason.get((23_000_000, "perplexity"), 0),
        "contam_dropped": byreason.get((24_000_000, "contaminated"), 0),
        "base_false_drops": 0,
        "ppl_ceiling": round(ceiling, 2),
    }

    # ------------------------------------------------------------------
    # Phase 3 (round 10): the LEARNED quality filter at scale — fit
    # the GPT-3-style classifier on a labeled sample (base = 1,
    # reversed-text junk = 0; reversal shifts the vocabulary, the
    # lexical signature a linear BOW model keys on), then run
    # curate(quality_clf=...) over base + planted junk. Every planted
    # junk doc must drop as 'model_quality'; zero base docs may.
    from timescale_cdc_spark.operators.curation import curate as _curate
    from timescale_cdc_spark.operators.quality_model import (
        fit_quality_classifier,
    )

    n_junk = max(n_normal // 100, 100)
    train_base = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", "text", F.lit(1.0).alias("label")
    )
    train_junk = train_base.select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
        F.lit(0.0).alias("label"),
    )
    t0 = time.time()
    clf = fit_quality_classifier(
        train_base.unionByName(train_junk).localCheckpoint(eager=True)
    )
    t_fit = time.time() - t0
    junk = docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 11 == 0)
        & (F.col("doc_id") < n_normal)
    ).limit(n_junk).select(
        (F.col("doc_id") + 31_000_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    corpus3 = docs.filter(F.col("doc_id") < n_normal).unionByName(
        junk
    ).localCheckpoint(eager=True)
    n_junk_actual = corpus3.filter(F.col("doc_id") >= 31_000_000).count()
    t0 = time.time()
    curated3 = _curate(
        corpus3,
        min_quality=0.0,
        min_tokens=5,
        near_dup_threshold=0.5,
        near_dup_max_bucket=256,
        quality_clf=clf,
        min_clf_prob=0.5,
    ).localCheckpoint(eager=True)
    t_clf_soak = time.time() - t0
    clf_counts = {
        (r["hi"], r["reason"]): r["n"]
        for r in curated3.select(
            (F.col("doc_id") >= 31_000_000).alias("hi"),
            F.coalesce("drop_reason", F.lit("kept")).alias("reason"),
        ).groupBy("hi", "reason").agg(F.count("*").alias("n")).collect()
    }
    assert clf_counts.get((True, "model_quality")) == n_junk_actual, (
        clf_counts
    )
    assert (False, "model_quality") not in clf_counts, clf_counts
    out["clf_soak"] = {
        "n_junk": n_junk_actual,
        "junk_dropped_model_quality": clf_counts.get(
            (True, "model_quality"), 0
        ),
        "base_false_model_drops": 0,
        "fit_sec": round(t_fit, 2),
        "curate_clf_sec": round(t_clf_soak, 2),
    }

    # ------------------------------------------------------------------
    # Phase 4 (round 11): the duplicated-content filter at scale —
    # curate(substr_n=...) over base + planted duplicated-span PAIRS
    # (each pair embeds one source doc's full text behind per-member
    # 3-word noise from a disjoint vocabulary). The base corpus shares
    # WORDS but never 8-gram sequences (the phase-2 construction), so
    # the invariant is exact: every planted member AND its source
    # (freq-3 spans, ratio ≥ 30/36 and 1.0) drops as 'substr_dup';
    # ZERO other base docs may.
    def _noise(prefix: str, salt: str, k_words: int = 3):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(prefix),
                    F.pmod(
                        F.xxhash64(F.col("doc_id"), F.lit(k), F.lit(salt)),
                        F.lit(5000),
                    ).cast("string"),
                )
                for k in range(k_words)
            ],
        )

    sub_src_mod = 1009
    base4 = docs.filter(F.col("doc_id") < n_normal)
    sub_src = base4.filter(F.col("doc_id") % sub_src_mod == 0)
    n_sub_src = sub_src.count()
    sub_a4 = sub_src.select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.concat(
            _noise("na", "sa"), F.lit(" "), F.col("text"), F.lit(" "),
            _noise("na", "st"),
        ).alias("text"),
    )
    sub_b4 = sub_src.select(
        (F.col("doc_id") + 41_000_000).alias("doc_id"),
        F.concat(
            _noise("nb", "sb"), F.lit(" "), F.col("text"), F.lit(" "),
            _noise("nb", "su"),
        ).alias("text"),
    )
    corpus4 = base4.unionByName(sub_a4).unionByName(sub_b4).localCheckpoint(
        eager=True
    )
    t0 = time.time()
    curated4 = _curate(
        corpus4,
        min_quality=0.0,
        min_tokens=5,
        near_dup_threshold=0.5,
        near_dup_max_bucket=256,
        substr_n=8,
        substr_max_ratio=0.5,
    ).localCheckpoint(eager=True)
    t_substr_soak = time.time() - t0
    sub_counts = {
        (r["grp"], r["reason"]): r["n"]
        for r in curated4.select(
            F.when(F.col("doc_id") >= 40_000_000, "planted")
            .when(F.col("doc_id") % sub_src_mod == 0, "source")
            .otherwise("base").alias("grp"),
            F.coalesce("drop_reason", F.lit("kept")).alias("reason"),
        ).groupBy("grp", "reason").agg(F.count("*").alias("n")).collect()
    }
    assert sub_counts.get(("planted", "substr_dup")) == 2 * n_sub_src, (
        sub_counts
    )
    assert sub_counts.get(("source", "substr_dup")) == n_sub_src, sub_counts
    assert ("base", "substr_dup") not in sub_counts, sub_counts
    out["substr_soak"] = {
        "n_span_pairs": n_sub_src,
        "planted_dropped_substr": sub_counts.get(
            ("planted", "substr_dup"), 0
        ),
        "sources_dropped_substr": sub_counts.get(
            ("source", "substr_dup"), 0
        ),
        "base_false_substr_drops": 0,
        "curate_substr_sec": round(t_substr_soak, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
