"""Sample-packing invariants: no doc lost or duplicated, budget
respected (strictly for the exact variant, within max-doc slack for
the window variant), oversized docs solo, deterministic pack ids."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.packing import (
    assign_packs,
    assign_packs_exact,
)

BUDGET = 100


def _corpus(spark, n=400, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, rng.randint(5, 80) if rng.random() > 0.02 else rng.randint(150, 300))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_window_packing_invariants(spark):
    rows, docs = _corpus(spark)
    out = assign_packs(docs, "n_tokens", "doc_id", BUDGET, num_partitions=8)
    got = out.collect()
    # bijective over docs
    assert sorted(r.doc_id for r in got) == sorted(i for i, _ in rows)
    max_doc = max(t for _, t in rows if t <= BUDGET)
    sums = (
        out.groupBy("pack_id").agg(F.sum("n_tokens").alias("s")).collect()
    )
    for r in sums:
        if r.pack_id.startswith("solo-"):
            continue
        # window variant: overflow bounded by the largest packed doc
        assert r.s < BUDGET + max_doc
    # oversized docs are solo
    solo = {r.doc_id for r in got if r.pack_id.startswith("solo-")}
    assert solo == {i for i, t in rows if t > BUDGET}
    # deterministic across runs
    again = {
        (r.doc_id, r.pack_id)
        for r in assign_packs(
            docs, "n_tokens", "doc_id", BUDGET, num_partitions=8
        ).collect()
    }
    assert again == {(r.doc_id, r.pack_id) for r in got}


def test_exact_packing_never_exceeds_budget(spark):
    rows, docs = _corpus(spark)
    out = assign_packs_exact(docs, "n_tokens", "doc_id", BUDGET, num_partitions=8)
    got = out.collect()
    assert sorted(r.doc_id for r in got) == sorted(i for i, _ in rows)
    by_pack: dict[int, list[tuple[int, int]]] = {}
    tok = dict(rows)
    for r in got:
        by_pack.setdefault(r.pack_seq, []).append((r.doc_id, tok[r.doc_id]))
    for members in by_pack.values():
        total = sum(t for _, t in members)
        if len(members) == 1:
            continue  # solo packs may hold one oversized doc
        assert total <= BUDGET
        assert all(t <= BUDGET for _, t in members)
    # oversized docs are alone in their pack
    for pid, members in by_pack.items():
        if any(t > BUDGET for _, t in members):
            assert len(members) == 1


def test_exact_matches_reference_greedy(spark):
    """Per-partition greedy must equal a pure-Python greedy over the
    same partition ordering — the oracle for the applyInPandas path."""
    rows, docs = _corpus(spark, n=120, seed=11)
    out = assign_packs_exact(docs, "n_tokens", "doc_id", BUDGET, num_partitions=4)
    got = out.select("doc_id", "pack_seq").collect()
    spark_packs = {r.doc_id: r.pack_seq for r in got}

    # reference: same hash distribution (taken from Spark's own
    # xxhash64, the only non-pure-Python step), same id order, same greedy
    parts = {
        r.doc_id: r.p
        for r in docs.withColumn(
            "p", F.pmod(F.xxhash64("doc_id"), F.lit(4))
        ).collect()
    }
    want: dict[int, int] = {}
    for p in range(4):
        members = sorted(
            [(i, t) for i, t in rows if parts[i] == p]
        )
        seq, run = 0, 0
        for i, t in members:
            if t > BUDGET or run + t > BUDGET:
                seq, run = seq + 1, 0
            run += min(t, BUDGET)
            want[i] = p * 10_000_000 + seq
            if t > BUDGET:
                seq, run = seq + 1, 0
    assert spark_packs == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=160), min_size=1, max_size=60),
    budget=st.integers(min_value=20, max_value=120),
)
def test_exact_packing_property(spark, toks, budget):
    """For arbitrary token counts and budgets: bijective over docs,
    multi-doc packs never exceed the budget, docs over budget always
    solo, pack members are contiguous in id order within a partition."""
    docs = spark.createDataFrame(
        list(enumerate(toks)), "doc_id long, n_tokens long"
    )
    got = assign_packs_exact(
        docs, "n_tokens", "doc_id", budget, num_partitions=3
    ).collect()
    assert sorted(r.doc_id for r in got) == list(range(len(toks)))
    by_pack: dict[int, list[int]] = {}
    for r in got:
        by_pack.setdefault(r.pack_seq, []).append(r.doc_id)
    for members in by_pack.values():
        total = sum(toks[i] for i in members)
        if len(members) > 1:
            assert total <= budget
        else:
            (i,) = members
            assert toks[i] > budget or total <= budget


def test_curate_then_pack_composition(spark):
    """The training-data flow: curation survivors feed the packer;
    every kept doc lands in exactly one pack, no dropped doc does."""
    from timescale_cdc_spark.operators.curation import curate

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the bank"),
        (2, "the quick brown fox jumps over the lazy dog near the bank"),
        (3, "a b"),  # fails min_tokens
        (4, "the market rallied today and investors cheered the results"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate(docs, min_quality=0.0, min_tokens=5)
    kept = curated.filter(F.col("kept")).select("doc_id", "ws_tokens")
    packed = assign_packs(kept, "ws_tokens", "doc_id", budget=64, num_partitions=2)
    got = {r.doc_id for r in packed.collect()}
    want = {r.doc_id for r in curated.filter(F.col("kept")).collect()}
    assert got == want
    assert 3 not in got  # min_tokens drop
    assert len(got) < len(rows)  # exact-dup of 1/2 dropped one


def test_pack_sequences_materialization(spark):
    """pack_sequences emits one row per pack with members joined in
    id order by the EOS separator — byte-deterministic, budget
    respected through to the artifact."""
    from pyspark.sql import functions as F

    from timescale_cdc_spark.operators.packing import (
        assign_packs,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, f"doc{i} body", 40) for i in range(6)],
        "doc_id long, text string, n_tokens long",
    )
    packed = assign_packs(
        docs, "n_tokens", "doc_id", budget=90, num_partitions=1,
        partition_expr=F.lit(0),
    )
    seqs = {r["pack_id"]: r for r in
            pack_sequences(packed, "text", "doc_id",
                           token_col="n_tokens").collect()}
    # 6 docs x 40 tokens, budget 90: the cumsum rule assigns each doc
    # to the 90-token window its START falls in (starts 0,40,80,120,
    # 160,200 -> windows 0,0,0,1,1,2), members join in id order
    assert len(seqs) == 3
    assert seqs["0-0"]["packed_text"] == (
        "doc0 body<|eos|>doc1 body<|eos|>doc2 body"
    )
    assert seqs["0-1"]["packed_text"] == "doc3 body<|eos|>doc4 body"
    assert seqs["0-2"]["packed_text"] == "doc5 body"
    assert [seqs[k]["n_docs"] for k in ("0-0", "0-1", "0-2")] == [3, 2, 1]
    assert [seqs[k]["n_tokens"] for k in ("0-0", "0-1", "0-2")] == [
        120, 80, 40,
    ]
