"""The full Tier-C training-data pipeline end-to-end (round 11):
curate → survivors → sequence packing → materialized packed text →
deterministic shard export with manifest — the exact chain a
pretraining-data team ships, run over the documents fixture with
every hand-off verified. Each stage is unit/oracle/soak-tested on its
own elsewhere; this test pins the COMPOSITION: ids survive hand-offs,
token budgets hold on curated text, every kept doc lands in exactly
one pack, every pack in exactly one shard, and the whole chain is
byte-deterministic across a re-run.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.operators.curation import curate
from timescale_cdc_spark.operators.packing import (
    assign_packs,
    pack_sequences,
)
from timescale_cdc_spark.operators.sharding import (
    read_shard_manifest,
    write_shards,
)

BUDGET = 120
N_SHARDS = 4


def _run_chain(spark, sf_dir, out_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    verdicts = curate(docs, substr_n=8, substr_max_ratio=0.8)
    kept_ids = verdicts.filter(F.col("kept")).select("doc_id")
    kept = docs.join(kept_ids, "doc_id")

    toks = kept.select(
        "doc_id", "text", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    packed = assign_packs(
        toks, "n_tokens", "doc_id", budget=BUDGET, num_partitions=8
    )
    sequences = pack_sequences(
        packed, "text", "doc_id", token_col="n_tokens"
    )
    manifest = write_shards(
        sequences, out_dir, ["pack_id"], N_SHARDS, salt="e2e"
    )
    return docs, verdicts, kept, packed, sequences, manifest


@pytest.mark.slow
def test_curate_pack_shard_chain(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    docs, verdicts, kept, packed, sequences, manifest = _run_chain(
        spark, sf_dir, out
    )

    n_docs = docs.count()
    n_kept = kept.count()
    # conservation at every hand-off
    assert verdicts.count() == n_docs
    assert 0 < n_kept < n_docs  # the fixture plants droppable docs
    assert packed.count() == n_kept  # every kept doc packed once
    assert packed.select("doc_id").distinct().count() == n_kept

    # pack integrity: within-budget packs respect the cumsum bound
    # (window packing may overflow by < the largest member), solo
    # packs are exactly the over-budget docs
    seq_rows = sequences.collect()
    n_packs = len(seq_rows)
    assert sum(r["n_docs"] for r in seq_rows) == n_kept
    solo = {r["pack_id"] for r in seq_rows if r["pack_id"].startswith("solo-")}
    over = {
        f"solo-{r['doc_id']}"
        for r in packed.filter(F.col("n_tokens") > BUDGET).collect()
    }
    assert solo == over

    # shard export covers every pack exactly once, manifest consistent
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == n_packs
    assert read_shard_manifest(out) == manifest
    exported = spark.read.parquet(out)
    assert exported.count() == n_packs
    assert exported.select("pack_id").distinct().count() == n_packs
    # the packed text itself survives the export byte-for-byte
    a = sequences.select("pack_id", "packed_text")
    b = exported.select("pack_id", "packed_text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # determinism: the entire chain reproduces identically
    out2 = str(tmp_path / "export2")
    *_, manifest2 = _run_chain(spark, sf_dir, out2)
    assert manifest2 == manifest
