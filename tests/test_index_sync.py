"""IndexCdcSync (streaming/index_sync.py) — CDC envelopes driving a
persisted ANN index: INSERT appends, DELETE tombstones, exactly-once
across checkpoint resume, the documented crash window reconciled by
repair(), and the unsound shapes (UPDATE, re-insert of a tombstoned
id) rejected loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.operators.ann_index import IvfIndex
from timescale_cdc_spark.streaming.harness import (
    run_to_completion,
    stage_stream_batches,
)
from timescale_cdc_spark.streaming.index_sync import IndexCdcSync


def _ins(df):
    return df.select(
        F.col("ts"),
        F.lit("dataschema").alias("schema_name"),
        F.lit("embeddings").alias("table_name"),
        F.lit("INSERT").alias("operation"),
        F.lit(None).cast("string").alias("before"),
        F.to_json(F.struct("vec_id", "embedding")).alias("after"),
    )


def _del(df):
    return df.select(
        F.col("ts"),
        F.lit("dataschema").alias("schema_name"),
        F.lit("embeddings").alias("table_name"),
        F.lit("DELETE").alias("operation"),
        F.to_json(F.struct("vec_id")).alias("before"),
        F.lit(None).cast("string").alias("after"),
    )


@pytest.fixture()
def corpus(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.timestamp_seconds(F.lit(1704844800) + F.col("vec_id"))
    )
    return em


def _envelope_stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


@pytest.mark.slow
def test_cdc_sync_insert_delete_resume(spark, corpus, tmp_path):
    """Build at 90%, stream the other 10% as INSERT envelopes and a
    takedown slice as DELETE envelopes; the index must reflect both;
    a second attach from the same checkpoint with nothing new is a
    no-op (exactly-once), and a third batch staged afterwards is
    picked up by the resumed query alone."""
    em = corpus
    base = em.filter(F.col("vec_id") % 10 != 0)
    extra = em.filter(F.col("vec_id") % 10 == 0)
    victims = [r["vec_id"] for r in
               base.select("vec_id").orderBy("vec_id").limit(3).collect()]

    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        base.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))

    env = _ins(extra).unionByName(
        _del(em.filter(F.col("vec_id").isin(victims)))
    )
    src = stage_stream_batches(
        [_ins(extra.filter(F.col("vec_id") < 500)),
         env.filter(
             (F.col("operation") == "DELETE")
             | (F.get_json_object("after", "$.vec_id").cast("long") >= 500)
         )],
        str(tmp_path / "envsrc"),
    )
    ckpt = str(tmp_path / "ckpt")
    stream = _envelope_stream(spark, src, _ins(extra).schema)
    run_to_completion(sync.attach(stream, ckpt, available_now=True))

    n_all = em.count()
    assert idx.corpus().count() == n_all - len(victims)
    # inserted ids queryable at cos 1.0; deleted ids gone
    probe = extra.orderBy("vec_id").first()
    q = spark.createDataFrame(
        [(1, probe["embedding"])], "vec_id long, embedding array<float>"
    )
    got = {r["c_id"] for r in idx.topk(q, k=3, n_probe=4).collect()}
    assert probe["vec_id"] in got
    assert not set(victims) & {
        r["c_id"]
        for r in idx.topk(
            em.filter(F.col("vec_id").isin(victims)).select(
                (F.col("vec_id") + 9_000_000).alias("vec_id"), "embedding"
            ),
            k=5,
            n_probe=8,
        ).collect()
    }
    assert sync.lag() == {
        "staged_batches": 2, "applied_batches": 2, "pending": 0
    }

    # resume with nothing new: exactly-once, corpus unchanged
    run_to_completion(
        sync.attach(
            _envelope_stream(spark, src, _ins(extra).schema),
            ckpt,
            available_now=True,
        )
    )
    assert idx.corpus().count() == n_all - len(victims)

    # repair with everything applied is a no-op; prune clears staging
    assert sync.repair() == 0
    assert sync.prune_staged() == 2
    assert sync.lag()["staged_batches"] == 0


@pytest.mark.slow
def test_cdc_sync_repair_recovers_lost_append(spark, corpus, tmp_path):
    """The documented crash window: marker committed, append never
    ran. The staged ids are invisible (never duplicated) and repair()
    re-appends exactly the missing rows; a second repair is a
    no-op."""
    em = corpus
    base = em.filter(F.col("vec_id") % 10 != 0)
    extra = em.filter(F.col("vec_id") % 10 == 0).drop("ts")
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        base.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))

    # simulate the crash: stage batch 0 and write its marker by hand,
    # skipping apply_batch's append step entirely
    extra.select("vec_id", "embedding").write.mode("overwrite").parquet(
        sync._staged_batch(0)
    )
    os.makedirs(sync._applied_path, exist_ok=True)
    with open(sync._marker(0), "w") as f:
        f.write("0")

    n_base = base.count()
    assert idx.corpus().count() == n_base  # invisible, not wrong
    assert sync.repair() == extra.count()
    assert idx.corpus().count() == n_base + extra.count()
    assert sync.repair() == 0  # idempotent
    assert sync.prune_staged() == 1


@pytest.mark.slow
def test_cdc_sync_rejects_update_and_tombstoned_reinsert(
    spark, corpus, tmp_path
):
    em = corpus
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        em.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))

    upd = _ins(em.limit(1)).withColumn("operation", F.lit("UPDATE"))
    with pytest.raises(ValueError, match="INSERT/DELETE"):
        sync.apply_batch(upd, 0)

    # delete + re-insert of the same id (across batches) must demand a
    # compact first — clearing the tombstone would resurrect old rows
    one = em.filter(F.col("vec_id") == 0)
    sync.apply_batch(_del(one), 1)
    with pytest.raises(ValueError, match="compact"):
        sync.apply_batch(_ins(one), 2)
    # after a physical purge the re-insert applies cleanly
    idx.compact()
    sync.apply_batch(_ins(one), 3)
    assert idx.corpus().filter(F.col("c_id") == 0).count() == 1


def test_cdc_sync_rejects_malformed_insert_payload(spark, corpus, tmp_path):
    """A malformed INSERT 'after' payload must fail loudly, never
    stage a NULL row into the index."""
    em = corpus
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        em.limit(50).drop("ts"), n_clusters=2
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    bad = _ins(em.limit(1)).withColumn("after", F.lit("not json"))
    with pytest.raises(ValueError, match="unparseable"):
        sync.apply_batch(bad, 0)
    missing_id = _ins(em.limit(1)).withColumn(
        "after", F.lit('{"embedding": [1.0]}')
    )
    with pytest.raises(ValueError, match="unparseable"):
        sync.apply_batch(missing_id, 1)


@pytest.mark.slow
def test_cdc_sync_repair_skips_tombstoned_staged_ids(
    spark, corpus, tmp_path
):
    """Round-14 review finding: a staged insert whose id a LATER
    batch tombstoned is deleted, not missing — repair() must not
    physically re-append it on every maintenance run (unbounded dead
    rows, resurrected by the next compact), and prune_staged() must
    treat it as reconciled."""
    em = corpus
    base = em.filter(F.col("vec_id") % 10 != 0)
    extra = em.filter(F.col("vec_id") % 10 == 0)
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        base.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    sync.apply_batch(_ins(extra), 0)          # insert the 10%
    victim = extra.orderBy("vec_id").first()["vec_id"]
    sync.apply_batch(
        _del(em.filter(F.col("vec_id") == victim)), 1
    )                                          # then take one down
    n_live = idx.corpus().count()
    assert sync.repair() == 0                  # deleted != missing
    assert idx.corpus().count() == n_live
    # physically absent too: the bare store gained no copy
    import os as _os

    bare = spark.read.parquet(_os.path.join(str(tmp_path / "idx"), "corpus"))
    assert bare.filter(F.col("c_id") == victim).count() == 1  # original only
    assert sync.prune_staged() == 2            # both batches reconciled
    # after compact purges the victim, repair still has nothing to do
    idx.compact()
    assert sync.repair() == 0


def _upd(df, new_id_offset=0):
    """UPDATE envelopes: before carries the old id, after the (maybe
    shifted) new id + vector — the reference's UPDATE shape
    (init.sql:16 TG_OP, readme.md: before+after both populated)."""
    return df.select(
        F.col("ts"),
        F.lit("dataschema").alias("schema_name"),
        F.lit("embeddings").alias("table_name"),
        F.lit("UPDATE").alias("operation"),
        F.to_json(F.struct("vec_id")).alias("before"),
        F.to_json(
            F.struct(
                (F.col("vec_id") + F.lit(new_id_offset)).alias("vec_id"),
                "embedding",
            )
        ).alias("after"),
    )


@pytest.mark.slow
def test_cdc_sync_split_updates_rewrites_id_changing_update(
    spark, corpus, tmp_path
):
    """updates='split' (round 15, VERDICT r14 #5): an id-CHANGING
    UPDATE applies as DELETE(before.id) + INSERT(after); a same-id
    in-place UPDATE still fails; the default reject mode names the
    escape hatch."""
    em = corpus
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        em.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"), updates="split")

    moved = em.filter(F.col("vec_id").isin([1, 2]))
    sync.apply_batch(_upd(moved, new_id_offset=5_000_000), 0)
    live = idx.corpus().select("c_id")
    assert live.filter(F.col("c_id").isin([1, 2])).count() == 0
    assert (
        live.filter(F.col("c_id").isin([5_000_001, 5_000_002])).count() == 2
    )
    # the moved vectors answer queries under their NEW ids
    probe = moved.orderBy("vec_id").select(
        (F.col("vec_id") + 9_000_000).alias("vec_id"), "embedding"
    )
    got = {r["c_id"] for r in idx.topk(probe, k=1, n_probe=8).collect()}
    assert got <= {5_000_001, 5_000_002} and got

    # same-id in-place UPDATE: rejected even under split
    with pytest.raises(ValueError, match="in-place"):
        sync.apply_batch(_upd(em.filter(F.col("vec_id") == 3)), 1)
    # default mode still rejects ALL updates, pointing at split
    strict = IndexCdcSync(idx, str(tmp_path / "sync2"))
    with pytest.raises(ValueError, match="updates='split'"):
        strict.apply_batch(_upd(moved, new_id_offset=7_000_000), 0)


@pytest.mark.slow
def test_cdc_sync_rejection_has_zero_side_effects(spark, corpus, tmp_path):
    """Validate-before-mutate (round 15, ADVICE r14): a batch that
    deletes AND re-inserts one id is rejected BEFORE its deletes
    apply — the index is byte-identical to its pre-batch state, so
    the wedged stream replays against an unmutated index instead of
    leaving a half-applied batch visible indefinitely."""
    em = corpus
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        em.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    n0 = idx.corpus().count()

    one = em.filter(F.col("vec_id") == 7)
    bad = _del(one).unionByName(_ins(one))
    with pytest.raises(ValueError, match="tombstoned"):
        sync.apply_batch(bad, 0)
    # zero side effects: no tombstone landed, the victim is still live
    from timescale_cdc_spark.operators import tombstones as tb

    assert tb.count_tombstones(spark, idx.path) == 0
    assert idx.corpus().count() == n0
    assert idx.corpus().filter(F.col("c_id") == 7).count() == 1


def test_cdc_sync_repair_requires_stopped_stream(spark, corpus, tmp_path):
    """Single-writer contract (round 15, ADVICE r14): repair() and
    prune_staged() refuse to run while the attached stream is active
    — an in-flight marker-committed batch looks crashed and would be
    double-appended."""
    em = corpus
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        em.limit(200).drop("ts"), n_clusters=4
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    src = stage_stream_batches(
        [_ins(em.filter(F.col("vec_id") % 10 == 0))],
        str(tmp_path / "envsrc"),
    )
    stream = _envelope_stream(
        spark, src, _ins(em.limit(1)).schema
    )
    q = sync.attach(stream, str(tmp_path / "ckpt"))  # continuous trigger
    try:
        with pytest.raises(RuntimeError, match="single-writer"):
            sync.repair()
        with pytest.raises(RuntimeError, match="single-writer"):
            sync.prune_staged()
    finally:
        q.stop()
        q.awaitTermination(60)
    # stopped stream: maintenance unblocked. stop() may have
    # interrupted the batch anywhere (including the marker-committed
    # crash window), so the first repair reconciles whatever was in
    # flight; the second must be a no-op.
    sync.repair()
    assert sync.repair() == 0


@pytest.mark.slow
def test_cdc_sync_compact_between_crash_and_repair(spark, corpus, tmp_path):
    """Round 15 (VERDICT r14 #6) — the poisonous interleave: a
    crash-window batch stages ids {x, y} (marker committed, append
    lost), a LATER batch deletes x, and index.compact() clears the
    tombstones BEFORE repair() runs. Without the sync's own
    batch-scoped deleted log, repair's only record that x was taken
    down dies with the tombstone and x is resurrected. And the
    scoping must not overreach: x RE-INSERTED by a batch NEWER than
    the delete, with its own crash window, must still be repaired —
    the delete only outranks earlier-or-equal stagings."""
    em = corpus
    base = em.filter(F.col("vec_id") % 10 != 0)
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        base.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    x, y = 0, 10  # both outside the built corpus

    # crash window: batch 0 staged {x, y} + marker, append LOST
    em.filter(F.col("vec_id").isin([x, y])).select(
        "vec_id", "embedding"
    ).write.parquet(sync._staged_batch(0))
    os.makedirs(sync._applied_path, exist_ok=True)
    with open(sync._marker(0), "w") as f:
        f.write("0")

    # batch 1 takes x down (normal apply path: deleted log + tombstone)
    sync.apply_batch(_del(em.filter(F.col("vec_id") == x)), 1)
    # compact BEFORE repair — the index's tombstones are now gone
    idx.compact()
    from timescale_cdc_spark.operators import tombstones as tb

    assert tb.count_tombstones(spark, idx.path) == 0

    # batch 2 legitimately RE-INSERTS x (post-compact), crash window
    em.filter(F.col("vec_id") == x).select(
        "vec_id", "embedding"
    ).write.parquet(sync._staged_batch(2))
    with open(sync._marker(2), "w") as f:
        f.write("2")

    # repair: y from batch 0 and x from batch 2 — x's BATCH-0 copy
    # stays dead (deleted by batch 1 >= 0), its batch-2 copy lives
    # (deleted-log batch 1 < staging batch 2)
    assert sync.repair() == 2
    live = idx.corpus()
    assert live.filter(F.col("c_id").isin([x, y])).count() == 2
    bare = spark.read.parquet(os.path.join(str(tmp_path / "idx"), "corpus"))
    assert bare.filter(F.col("c_id") == x).count() == 1  # no resurrection
    assert sync.repair() == 0  # idempotent

    # prune reconciles all three batch dirs and GCs the deleted log
    assert sync.prune_staged() == 3
    assert sync._sync_deleted() is None
    assert sync.lag()["staged_batches"] == 0


@pytest.mark.slow
def test_cdc_sync_prune_partial_gc_keeps_log_swap_safe(
    spark, corpus, tmp_path
):
    """The deleted-log GC's PARTIAL path (round 15): some staged dirs
    prune while others stay — the log must survive the two-rename
    swap rewrite, keep serving repair for the kept dirs, and clear
    only when staging fully empties."""
    em = corpus
    base = em.filter(F.col("vec_id") % 10 != 0)
    idx = IvfIndex(spark, str(tmp_path / "idx")).build(
        base.drop("ts"), n_clusters=8
    )
    sync = IndexCdcSync(idx, str(tmp_path / "sync"))
    x, w = 0, 20  # both outside the built corpus

    # crash-window batch 0 stages {x}; batch 1 deletes x; crash-window
    # batch 2 stages {w} (never appended, never deleted)
    em.filter(F.col("vec_id") == x).select(
        "vec_id", "embedding"
    ).write.parquet(sync._staged_batch(0))
    os.makedirs(sync._applied_path, exist_ok=True)
    with open(sync._marker(0), "w") as f:
        f.write("0")
    sync.apply_batch(_del(em.filter(F.col("vec_id") == x)), 1)
    em.filter(F.col("vec_id") == w).select(
        "vec_id", "embedding"
    ).write.parquet(sync._staged_batch(2))
    with open(sync._marker(2), "w") as f:
        f.write("2")

    # partial prune: dir0 (x fully reconciled by the batch-1 delete)
    # and dir1 (empty) go; dir2 (w pending repair) stays
    assert sync.prune_staged() == 2
    assert sync.lag()["staged_batches"] == 1
    # the GC rewrite went through the atomic swap — no debris, and
    # reads still work (w is not deleted, so the log content no
    # longer needs the x row; either shape is correct as long as
    # repair stays honest)
    assert not os.path.isdir(sync._deleted_path + "._purge_tmp")
    assert sync.repair() == 1  # w re-appended
    assert idx.corpus().filter(F.col("c_id") == w).count() == 1
    assert idx.corpus().filter(F.col("c_id") == x).count() == 0
    # staging now fully reconciled: final prune clears it and the log
    assert sync.prune_staged() == 1
    assert sync._sync_deleted() is None
    assert sync.lag()["staged_batches"] == 0
