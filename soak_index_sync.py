#!/usr/bin/env python3
"""IndexCdcSync full-lifecycle soak (round 15, VERDICT r14 #6):
drive ingest → takedown → id-changing UPDATEs through the
``updates='split'`` rewrite (VERDICT r14 #5 at soak scale) →
crash-window → ANOTHER takedown hitting the crash-window's staged
ids → index.compact() BETWEEN the marker and the repair → repair()
→ prune_staged(), asserting CONTENT-HASH equality between the
served corpus and a batch-computed expected ledger after every
phase.

The phase order is the adversarial one: compact() clears the index's
tombstones, so a repair that relied on tombstones alone would
resurrect the staged-then-deleted ids (the bug the sync's
batch-scoped deleted log exists to prevent — index_sync.py step 3)
and lose nothing else. The ledger is re-derived independently from
the batch definitions (plain DataFrame set algebra, no sync state),
so a divergence anywhere in the marker/staging/tombstone/log
machinery shows up as a hash mismatch, not a green run.

Content hash: count + bit_xor(xxhash64(c_id)) over the live corpus —
order-free, partition-free, and collision-odds ~2^-64 per phase.
A final recall@5 probe against the exact matmul baseline pins that
the surviving index still SERVES correctly (insert-batch queries and
build-resident queries).

Usage: python soak_index_sync.py [n_build] [n_batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

from soak_ann import synth_clustered_vecs
from timescale_cdc_spark.operators.ann_index import IvfIndex
from timescale_cdc_spark.operators.similarity import brute_force_topk_matmul
from timescale_cdc_spark.session import get_spark
from timescale_cdc_spark.streaming.index_sync import IndexCdcSync


#: UPDATE-move offset: above any soak id (house convention — an
#: offset below max id would collide a moved id with a real id)
MOVE_OFF = 1_000_000_000


def _envelopes(df, op: str):
    """Wrap (vec_id, embedding) rows as CDC envelopes of one op.
    UPDATE moves the id by MOVE_OFF (before = old id, after = new id
    + vector — the id-changing shape updates='split' rewrites)."""
    before = (
        F.to_json(F.struct("vec_id")) if op in ("DELETE", "UPDATE")
        else F.lit(None).cast("string")
    )
    if op == "INSERT":
        after = F.to_json(F.struct("vec_id", "embedding"))
    elif op == "UPDATE":
        after = F.to_json(
            F.struct(
                (F.col("vec_id") + MOVE_OFF).alias("vec_id"), "embedding"
            )
        )
    else:
        after = F.lit(None).cast("string")
    return df.select(
        F.current_timestamp().alias("ts"),
        F.lit("dataschema").alias("schema_name"),
        F.lit("embeddings").alias("table_name"),
        F.lit(op).alias("operation"),
        before.alias("before"),
        after.alias("after"),
    )


def _content_hash(df) -> tuple[int, int]:
    r = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(c_id))"), F.lit(0)).alias("h"),
    ).first()
    return int(r["n"]), int(r["h"])


def main() -> None:
    n_build = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    spark = get_spark(app_name="soak_index_sync")
    root = tempfile.mkdtemp(prefix="soak_index_sync_")

    pool = synth_clustered_vecs(
        spark, n_build + 3 * n_batch, n_clusters=256
    ).localCheckpoint()
    build = pool.filter(F.col("vec_id") < n_build)
    b1 = pool.filter(
        (F.col("vec_id") >= n_build) & (F.col("vec_id") < n_build + n_batch)
    )
    b2 = pool.filter(
        (F.col("vec_id") >= n_build + n_batch)
        & (F.col("vec_id") < n_build + 2 * n_batch)
    )
    crash = pool.filter(F.col("vec_id") >= n_build + 2 * n_batch)

    idx = IvfIndex(spark, os.path.join(root, "idx")).build(
        build, n_clusters=256
    )
    sync = IndexCdcSync(idx, os.path.join(root, "sync"), updates="split")

    expected = build.select(F.col("vec_id").alias("c_id"))
    report: list[dict] = []

    def check(phase: str, t0: float) -> None:
        en, eh = _content_hash(expected)
        gn, gh = _content_hash(idx.corpus().select("c_id"))
        ok = (en, eh) == (gn, gh)
        report.append(
            {
                "phase": phase,
                "sec": round(time.monotonic() - t0, 2),
                "rows": gn,
                "hash_ok": ok,
            }
        )
        print(json.dumps(report[-1]), flush=True)
        if not ok:
            raise AssertionError(
                f"{phase}: expected ({en}, {eh:x}) got ({gn}, {gh:x})"
            )

    # phase 1: two insert batches through the normal apply path
    t0 = time.monotonic()
    sync.apply_batch(_envelopes(b1, "INSERT"), 0)
    sync.apply_batch(_envelopes(b2, "INSERT"), 1)
    expected = expected.unionByName(
        b1.unionByName(b2).select(F.col("vec_id").alias("c_id"))
    ).localCheckpoint()
    check("ingest_2x", t0)

    # phase 2: takedown of every 20th build id (5% of the original)
    t0 = time.monotonic()
    victims1 = build.filter(F.col("vec_id") % 20 == 0).select(
        "vec_id", "embedding"
    )
    sync.apply_batch(_envelopes(victims1, "DELETE"), 2)
    expected = expected.join(
        victims1.select(F.col("vec_id").alias("c_id")), "c_id", "left_anti"
    ).localCheckpoint()
    check("takedown_5pct", t0)

    # phase 2b (round 15, VERDICT r14 #5 at soak scale): id-changing
    # UPDATE envelopes through updates='split' — every b2 id % 5 == 1
    # moves to id + MOVE_OFF; the ledger swaps old for new 1:1
    t0 = time.monotonic()
    moved = b2.filter(F.col("vec_id") % 5 == 1)
    sync.apply_batch(_envelopes(moved, "UPDATE"), 3)
    expected = expected.join(
        moved.select(F.col("vec_id").alias("c_id")), "c_id", "left_anti"
    ).unionByName(
        moved.select((F.col("vec_id") + MOVE_OFF).alias("c_id"))
    ).localCheckpoint()
    check("update_split", t0)

    # phase 3: crash window — staged + marker, append LOST. Invisible:
    # the served corpus must be unchanged.
    t0 = time.monotonic()
    crash.select("vec_id", "embedding").write.mode("overwrite").parquet(
        sync._staged_batch(4)
    )
    os.makedirs(sync._applied_path, exist_ok=True)
    with open(sync._marker(4), "w") as f:
        f.write("4")
    check("crash_window", t0)

    # phase 4: a SECOND takedown deleting half the crash-window's
    # staged ids (never appended!) plus a slice of live b1 ids — the
    # deletes repair() must keep honoring after the compact below
    t0 = time.monotonic()
    dead_staged = crash.filter(F.col("vec_id") % 2 == 0)
    dead_live = b1.filter(F.col("vec_id") % 10 == 3)
    sync.apply_batch(
        _envelopes(dead_staged.unionByName(dead_live), "DELETE"), 5
    )
    expected = expected.join(
        dead_live.select(F.col("vec_id").alias("c_id")), "c_id", "left_anti"
    ).localCheckpoint()
    check("takedown_staged_and_live", t0)

    # phase 5: compact BETWEEN the marker and the repair — physically
    # purges, clears the index's tombstones, serving content unchanged
    t0 = time.monotonic()
    idx.compact()
    from timescale_cdc_spark.operators import tombstones as tb

    assert tb.count_tombstones(spark, idx.path) == 0
    check("compact_mid_interleave", t0)

    # phase 6: repair — re-appends exactly the UNDELETED half of the
    # crash-window batch; the deleted-staged ids must NOT resurrect
    t0 = time.monotonic()
    n_repaired = sync.repair()
    survivors = crash.filter(F.col("vec_id") % 2 != 0)
    assert n_repaired == survivors.count(), n_repaired
    expected = expected.unionByName(
        survivors.select(F.col("vec_id").alias("c_id"))
    ).localCheckpoint()
    check("repair", t0)
    assert sync.repair() == 0  # idempotent

    # phase 7: prune — everything reconciled, deleted log GC'd
    t0 = time.monotonic()
    n_pruned = sync.prune_staged()
    assert n_pruned >= 1, n_pruned
    assert sync._sync_deleted() is None
    assert sync.lag()["staged_batches"] == 0
    check("prune", t0)

    # serving probe: recall@5 vs exact matmul for repaired-batch and
    # build-resident queries over the FINAL corpus
    final = pool.join(
        expected.select(F.col("c_id").alias("vec_id")), "vec_id"
    )
    for name, qsrc in (
        ("repaired", survivors.limit(50)),
        ("resident", build.filter(F.col("vec_id") % 20 != 0).limit(50)),
    ):
        q = qsrc.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        exact = {
            (r.q_id, r.c_id)
            for r in brute_force_topk_matmul(final, q, k=5).collect()
        }
        approx = {
            (r.q_id, r.c_id)
            for r in idx.topk(q, k=5, n_probe=16).collect()
        }
        rec = len(exact & approx) / len(exact) if exact else 0.0
        print(json.dumps({"recall@5": name, "value": round(rec, 4)}),
              flush=True)
        assert rec >= 0.9, (name, rec)

    print(json.dumps({"soak": "index_sync_lifecycle", "phases": report,
                      "ok": True}), flush=True)


if __name__ == "__main__":
    main()
