"""Physical-plan regression tests: the properties that make these
queries survive 100 TB must stay visible in the plan (SURVEY.md goal —
'the plan you'd want, not the first one that passed')."""

from __future__ import annotations

import pytest

from timescale_cdc_spark.plans import formatted_plan
from timescale_cdc_spark.queries import QUERIES


def _plan(spark, name, sf_dir) -> str:
    return formatted_plan(QUERIES[name](spark, sf_dir))


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "b12_b17_scan_projection_computed", sf_dir)
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan, "filter not pushed to scan"
    # column pruning: only the 6 referenced columns are read
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_shipdate",
        "l_returnflag",
    ]:
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "b21_join_broadcast", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, "dim joins must broadcast"
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, "b31_sort_limit_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must plan top-K"


def test_agg_is_partial(spark, sf_dir):
    plan = _plan(spark, "b25_agg_pricing_summary", sf_dir)
    assert "partial_sum" in plan, "aggregation must combine map-side"
    assert "LessThanOrEqual(l_shipdate" in plan, "ship-date filter not pushed"


def test_asof_join_is_bounded(spark, sf_dir):
    """VERDICT round 1: the as-of join must carry a TWO-SIDED time
    bound so per-key fan-out is bounded by the lookback horizon, not
    the full history of a hot key."""
    plan = _plan(spark, "b23_asof_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "INTERVAL" in plan, "lookback horizon missing from join condition"
    # the join condition must compare c.ts against BOTH p.ts (upper)
    # and p.ts - horizon (lower)
    join_lines = [l for l in plan.splitlines() if "Join" in l and "ts" in l]
    assert any("INTERVAL" in l for l in join_lines), (
        "two-sided ts bound not in the join condition"
    )


def test_embedding_dup_pairs_no_all_pairs(spark, sf_dir):
    """VERDICT round 1: the REGISTERED embedding near-dup query must be
    LSH-bucketed — a hash self-join on band keys, never an O(n²)
    CartesianProduct."""
    plan = _plan(spark, "c3_embedding_dup_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_bucketed_is_hash_join(spark, sf_dir):
    """The keyless interval join must become an equi-join on tolerance
    buckets (hash/sort-merge), not a nested loop."""
    plan = _plan(spark, "b22_range_join_bucketed", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_self_joins_are_shuffle_hash(spark, sf_dir):
    """Round 3: LSH band self-joins must keep BOTH sides as shuffle
    exchanges (identical canonical form → AQE ReusedQueryStage runs
    the sketch pipeline once). A one-sided broadcast would rebuild the
    whole sketch aggregation as a separate broadcast pipeline —
    measured 2.2× slower."""
    for name in ("c2_minhash_simhash", "c3_embedding_dup_pairs"):
        plan = _plan(spark, name, sf_dir)
        assert "ShuffledHashJoin" in plan, f"{name}: band join not shuffle-hash"
        for line in plan.splitlines():
            if "BroadcastHashJoin" in line and "bucket" in line:
                raise AssertionError(f"{name}: band join got broadcast: {line}")


def test_no_python_udf_in_core_relational_plans(spark, sf_dir):
    """The relational + CDC surface must be 100% JVM-side (B40/C5 are
    the only sanctioned Python edges)."""
    for name in [
        "flagship_segment_revenue",
        "b25_agg_pricing_summary",
        "b30_latest_state_replay",
        "c2_minhash_simhash",
        "c3_topk_cosine",
        "c4_text_analysis",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has Python in the hot path"
        )


def test_banded_candidates_hot_cold_union_plan(spark):
    """Round-4 VERDICT #4: the skew-guarded candidate path (hot-bucket
    star pairing unioned with the cold all-pairs join,
    operators/dedup.py::_banded_candidates) must stay (a) cartesian-
    free and (b) single-sketch-pipeline — the banded frame feeds the
    bucket-stats agg, the cold self-join, and the hot star join through
    REUSED exchanges (identical canonical form + shuffle_hash hints),
    never as independent re-sketches of the corpus."""
    from timescale_cdc_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "all these documents share every word exactly")
            for i in range(20)]
    rows += [(100 + i, f"unique text number {i} with tokens {i * 7}")
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "text", "doc_id",
                              threshold=0.5, max_bucket=4)
    got = pairs.collect()  # AQE must finalize before reading the plan

    ep = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in ep
    assert "BroadcastNestedLoopJoin" not in ep
    assert ep.count("ReusedExchange") >= 1, (
        "guarded path re-built the sketch pipeline instead of reusing "
        "its shuffle exchange"
    )

    # and the guard's OUTPUT contract: the 20-doc identical cluster is
    # star-connected through its representative (min id), not O(f²)
    hot = [(r.id_a, r.id_b) for r in got if r.id_b < 100]
    assert sorted(hot) == [(0, i) for i in range(1, 20)]


def test_lib_entries_scan_facts_once(spark, sf_dir):
    """Round 9 (VERDICT r8 #4): the lib_* union entries cache their
    fact scan, so every `Scan parquet` string in the executed plan is
    the cached relation's BUILD plan printed inside an
    InMemoryTableScan block — one physical materialization, N cache
    reads — never an independent re-scan per union branch.

    Round 13 (ADVICE r12): the r12 relaxation n_file <= n_mem could
    mask a union branch re-scanning parquet (+1 FileScan) offset by an
    incidental extra cache-on-cache read (+1 InMemoryTableScan) —
    the EXPECTED cache-on-cache surplus is pinned per entry instead,
    so an offsetting FileScan regression shifts the pinned pair and
    trips. When an entry's structure legitimately changes, re-measure
    and re-pin. Round 14 re-pin: lib_m4's ppl family now reads the
    build-once LM ARTIFACT (a vocabulary-sized parquet, VERDICT r13
    #3) instead of consuming the token-count cache — its FileScans
    are artifact scans, not fact re-scans, and the counts-cache
    InMemoryTableScan blocks left the plan with it."""
    # Round 15 re-pin (all three entries got structurally CHEAPER):
    # - lib_state (5,5)→(2,2): the daily state rollup `sr` is now
    #   localCheckpointed, so its two consuming branches (state +
    #   state_interp) read `Scan ExistingRDD` instead of re-running
    #   the partials window + fold over the cached scan per branch.
    # - lib_stats (10,10)→(8,8): same for the rolled UDDSketch `sk`
    #   (bin-explode + accessor branches).
    # - lib_m4 (17,16)→(13,12): connected_components checkpoints its
    #   INITIAL symmetrized edges, so the final roots anti-join reads
    #   the checkpoint instead of re-deriving the whole pairs pipeline
    #   (4 fewer scans in the executed plan).
    # The invariant this test protects is unchanged: no union branch
    # re-scans parquet outside the cache — checkpoint reads are
    # materializations, not re-scans.
    expected = {
        "lib_state_heartbeat_freq": (2, 2),
        "lib_stats_counter_candle": (8, 8),
        "lib_m4_split_sample": (13, 12),
    }
    for name, (want_file, want_mem) in expected.items():
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        n_file = plan.count("FileScan")
        n_mem = plan.count("InMemoryTableScan")
        assert (n_file, n_mem) == (want_file, want_mem), (
            f"{name}: (FileScan, InMemoryTableScan) = "
            f"({n_file}, {n_mem}), pinned ({want_file}, {want_mem}) — "
            "a union branch re-scanning parquet outside the cache, or "
            "a structural change that needs a re-pin"
        )


def test_bench_family_timed_lists_match_entries(spark, sf_dir):
    """Round 11 (VERDICT r10 #3): bench.py's FAMILY_TIMED lists drive
    the per-family timing breakdown of the two library mega-entries —
    pin them against the entries' ACTUAL family tags so a new family
    can't silently miss its timing row (and a renamed one can't time
    an empty filter). Also pin that the family filter really prunes:
    the filtered plan must drop to a fraction of the union's scans."""
    import bench

    for entry, fams in bench.FAMILY_TIMED.items():
        actual = {
            r["family"]
            for r in QUERIES[entry](spark, sf_dir)
            .select("family").distinct().collect()
        }
        assert set(fams) == actual, (entry, sorted(actual))
        assert len(fams) == len(set(fams)), f"{entry}: duplicate tags"
    # literal-fold pruning: one family's plan is a strict subtree
    from pyspark.sql import functions as F

    df = QUERIES["lib_m4_split_sample"](spark, sf_dir)
    full = df._jdf.queryExecution().executedPlan().toString()
    one = (
        df.filter(F.col("family") == "split")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert one.count("InMemoryTableScan") < full.count("InMemoryTableScan")


def test_urldup_srccap_families_plan_shape(spark, sf_dir):
    """Round 12 (VERDICT r11 #3): the new lib_m4_split_sample families
    keep the scale shapes they claim — both the source-cap reservoir
    and the URL dedup keep-first window plan as WindowGroupLimit (rank
    pushdown: each upstream partition forwards ≤k candidates per
    group before the exchange), and the URL normalization chain stays
    inside codegen (no Python eval anywhere in the entry)."""
    from pyspark.sql import functions as F

    df = QUERIES["lib_m4_split_sample"](spark, sf_dir)
    for fam in ("srccap", "urldup"):
        plan = (
            df.filter(F.col("family") == fam)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan, fam
        assert "BatchEvalPython" not in plan, fam
        assert "ArrowEvalPython" not in plan, fam
