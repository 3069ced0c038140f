"""Connected-components correctness: the distributed large-star/
small-star iteration must agree with a reference union-find on random
pair graphs, including chains (the case the single-pass star
approximation gets conservative about) and high-degree stars."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp[x] = min(comp.get(r, x), x)
    # second pass so every member maps to the true min
    mins: dict[int, int] = {}
    for x in parent:
        mins.setdefault(find(x), x)
        mins[find(x)] = min(mins[find(x)], x)
    return {x: mins[find(x)] for x in parent}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(df).collect()
    # exactly one (node, component) row per node — a dict built from
    # rows would silently mask duplicate conflicting assignments
    assert len(rows) == len({r.node for r in rows})
    got = {r.node: r.component for r in rows}
    want = _union_find(pairs)
    assert got == want


@pytest.mark.slow
def test_chains_stars_and_random_graphs(spark):
    # chain: a<b<c<d linked pairwise-adjacent only (transitive closure
    # must still group them all)
    _check(spark, [(1, 2), (2, 3), (3, 4)])
    # star + separate pair + bridge merging two clusters
    _check(spark, [(10, 11), (10, 12), (10, 13), (20, 21), (13, 20)])
    # random graphs
    rng = random.Random(3)
    for trial in range(3):
        n = 60
        pairs = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(40)
        ]
        pairs = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
        _check(spark, pairs)


def test_mega_component_hub_and_long_chain(spark):
    """Skew shapes: one 500-node hub star (boilerplate mega-component
    — the case that made collect_set a one-task straggler) plus a
    64-node chain (max diameter per edge count), together with
    singleton pairs. Exercises the min+join star steps on both skew
    axes and the convergence check across >1 round."""
    pairs = [(0, i) for i in range(1, 500)]          # hub star at 0
    pairs += [(1000 + i, 1001 + i) for i in range(63)]  # chain
    pairs += [(5000, 5001), (6000, 6001)]            # isolated pairs
    _check(spark, pairs)


def test_multi_parent_star_state_not_a_fixpoint(spark):
    """ADVICE r3 medium regression: {(2,0),(3,0),(2,1),(4,1)} is a
    multi-parent star — destinations {0,1} disjoint from sources
    {2,3,4}, so the old 'no destination is a source' check alone would
    accept it as converged, returning node 2 twice (components 0 AND 1)
    and never merging 0 with 1. With the function check (countDistinct
    parent == 1) the loop must keep iterating until everything lands in
    the single true component rooted at 0. Also covers variants with
    extra bridges that pass through the same state mid-iteration."""
    _check(spark, [(2, 0), (3, 0), (2, 1), (4, 1)])
    _check(spark, [(2, 0), (3, 0), (2, 1), (4, 1), (7, 5), (7, 6), (8, 6)])
    # two genuinely separate components stay separate
    _check(spark, [(2, 0), (3, 0), (5, 4), (6, 4)])


def test_dedup_keep_canonical_transitive(spark):
    """A chain of near-dup pairs collapses to ONE kept doc (the
    minimum), unlike the conservative single-pass approximation."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a long, id_b long"
    )
    kept = {r.doc_id for r in dedup_keep_canonical(docs, pairs).collect()}
    assert kept == {1, 5, 6}
