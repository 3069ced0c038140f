"""CDC-fed vector-index maintenance (round 14): stream a CDC topic's
envelopes INTO a persisted ANN index, closing the loop between the
CDC surface (reference: timescale/init.sql:41-49's envelope table,
whose INSERT/DELETE rows this consumes) and the index family's
append/delete machinery — the "embedding store that tracks the
corpus" a pretraining deployment actually runs: new documents arrive
as INSERT envelopes carrying the vector, takedowns arrive as DELETE
envelopes, and the serving index absorbs both without a rebuild.

Works against any persisted index class with ``append`` + ``delete``
(IvfIndex, LshIndex, Sq8Index, IvfSq8Index — the PQ classes are
build-once encoders with no append path, so no sync either).

Semantics and crash discipline
------------------------------

* **INSERT + DELETE only.** An UPDATE is rejected with a clear error:
  an embedding row is content-addressed (the vector IS the content),
  so a revision is a DELETE of the old id plus an INSERT of a new id
  — never an in-place mutation. Allowing in-place updates under
  id-level tombstones would be unsound: tombstoning the old version
  hides the new one too.
* **Re-inserting a tombstoned id is rejected** until a ``compact()``
  physically purges the old rows — otherwise clearing the tombstone
  would resurrect the OLD row next to the new one. The error says so.
* **Exactly-once deletes, at-most-once appends, repair reconciles.**
  Per micro-batch: (1) the parsed insert rows land in a per-batch
  staging partition (``overwrite`` — idempotent on replay), (2)
  deletes apply (tombstone-append — idempotent), (3) the applied
  MARKER commits, (4) the appends run from staging. A crash before
  the marker replays the batch through steps 1-3, all idempotent. A
  crash after the marker can lose part of step 4's appends — rows
  that are then INVISIBLE (never duplicated, never wrong) until
  :meth:`repair` anti-joins staged ids against the live corpus and
  re-appends exactly the missing ones. This is the same
  prefer-invisible-missing-over-wrong-duplicates discipline as
  ``Sq8Index.append``'s raw-first ordering, extended to the stream.

At 100 TB: per-batch cost is O(batch) — a tombstone append, a staging
write, and the index's own partition-local append; nothing scans the
corpus. ``repair``/``prune_staged`` are maintenance-cadence (one
pruned id-column anti-join), not per-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescale_cdc_spark.operators import tombstones as tb


class IndexCdcSync:
    """Wire a CDC envelope stream into a persisted ANN index.

    ``index``: any of IvfIndex/LshIndex/Sq8Index/IvfSq8Index (needs
    ``append``, ``delete``, and one of ``corpus``/``raw``/``banded``).
    ``path``: sync state — ``<path>/staged/_batch_id=N`` (parsed
    insert rows) and ``<path>/applied/batch-N`` (markers).
    """

    def __init__(
        self,
        index,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.index = index
        self.spark = index.spark
        self.path = path.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col

    # -- paths ----------------------------------------------------------

    @property
    def _staged_path(self) -> str:
        return f"{self.path}/staged"

    @property
    def _applied_path(self) -> str:
        return f"{self.path}/applied"

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self._applied_path, f"batch-{batch_id}")

    def _staged_batch(self, batch_id: int) -> str:
        return os.path.join(self._staged_path, f"_batch_id={batch_id}")

    # -- envelope parsing -------------------------------------------------

    def _payload_schema(self) -> str:
        return f"{self.id_col} long, {self.vec_col} array<float>"

    def parse(self, envelopes: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Split an envelope frame into (insert rows, delete ids).
        INSERT vectors ride in ``after`` JSON, DELETE ids in
        ``before`` (the reference's null rules, readme.md:252-267).
        Raises on any other operation — see the module docstring.

        All validation runs as ONE aggregation pass over the batch
        (unknown ops, unparseable INSERT ``after`` payloads, AND
        unparseable DELETE ``before`` ids — a silently dropped
        takedown would be worse than the loud insert failure); only
        the error path takes extra jobs to fetch samples."""
        ins_id = F.from_json("after", self._payload_schema())[self.id_col]
        del_id = F.from_json("before", f"{self.id_col} long")[self.id_col]
        bad_ins = (F.col("operation") == "INSERT") & ins_id.isNull()
        bad_del = (F.col("operation") == "DELETE") & del_id.isNull()
        stats = envelopes.agg(
            F.collect_set(
                F.when(
                    ~F.col("operation").isin("INSERT", "DELETE"),
                    F.col("operation"),
                )
            ).alias("bad_ops"),
            F.sum(bad_ins.cast("int")).alias("n_bad_ins"),
            F.sum(bad_del.cast("int")).alias("n_bad_del"),
        ).first()
        if stats["bad_ops"]:
            raise ValueError(
                f"IndexCdcSync consumes INSERT/DELETE envelopes only, "
                f"got {sorted(stats['bad_ops'])}: an embedding row is "
                f"content-addressed — send a revision as DELETE(old id) "
                f"+ INSERT(new id)"
            )
        if stats["n_bad_ins"]:
            sample = envelopes.filter(bad_ins).select("after").first()
            raise ValueError(
                f"{stats['n_bad_ins']} INSERT envelope(s) with "
                f"unparseable 'after' payloads (need JSON "
                f"{self._payload_schema()!r}); first: {sample['after']!r}"
            )
        if stats["n_bad_del"]:
            sample = envelopes.filter(bad_del).select("before").first()
            raise ValueError(
                f"{stats['n_bad_del']} DELETE envelope(s) with "
                f"unparseable 'before' ids (need JSON with "
                f"{self.id_col!r}); first: {sample['before']!r} — a "
                f"NULL tombstone matches nothing, so the takedown "
                f"would silently never take effect"
            )
        adds = envelopes.filter(F.col("operation") == "INSERT").select(
            F.from_json("after", self._payload_schema()).alias("_p")
        ).select(
            F.col(f"_p.{self.id_col}").alias(self.id_col),
            F.col(f"_p.{self.vec_col}").alias(self.vec_col),
        )
        dels = envelopes.filter(F.col("operation") == "DELETE").select(
            del_id.alias(self.id_col)
        )
        return adds, dels

    # -- the per-batch apply (foreachBatch body) ---------------------------

    def apply_batch(self, envelopes: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch, already fully applied
        adds, dels = self.parse(envelopes)
        # (1) stage the inserts — overwrite makes replays idempotent,
        # and the append below reads THIS stable copy, not the topic
        staged_dir = self._staged_batch(batch_id)
        adds.write.mode("overwrite").parquet(staged_dir)
        staged = self.spark.read.parquet(staged_dir)
        # (2) deletes — tombstone append, idempotent
        self.index.delete(dels, id_col=self.id_col)
        # re-insert-of-tombstoned-id guard (AFTER this batch's deletes,
        # so delete+insert of one id in one batch is also caught)
        dead = tb.read_tombstones(self.spark, self.index.path)
        if dead is not None:
            n_dead_adds = staged.join(
                F.broadcast(dead.withColumnRenamed("c_id", self.id_col)),
                self.id_col,
            ).count()
            if n_dead_adds:
                raise ValueError(
                    f"batch {batch_id}: {n_dead_adds} insert id(s) are "
                    f"tombstoned in the index; run index.compact() to "
                    f"purge the old rows before re-inserting those ids "
                    f"(clearing a tombstone would resurrect the old "
                    f"row next to the new one)"
                )
        # (3) marker BEFORE the append: a crash past this point can
        # only lose appends (invisible rows repair() re-adds), never
        # double-apply them on replay
        os.makedirs(self._applied_path, exist_ok=True)
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker(batch_id))
        # (4) appends, from staging
        if staged.limit(1).count():
            self.index.append(
                staged, id_col=self.id_col, vec_col=self.vec_col
            )

    def attach(
        self,
        envelope_stream: DataFrame,
        checkpoint: str,
        available_now: bool = False,
    ):
        """Start the sync: each micro-batch of CDC envelopes applies
        through :meth:`apply_batch`. Stop/re-attach with the same
        checkpoint resumes exactly like the cagg attach;
        ``available_now`` drains the backlog and terminates (tests,
        catch-up runs)."""
        w = (
            envelope_stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # -- reconciliation (maintenance cadence) ------------------------------

    def _live_ids(self) -> DataFrame:
        for acc in ("corpus", "raw", "banded"):
            if hasattr(self.index, acc):
                return (
                    getattr(self.index, acc)()
                    .select(F.col("c_id").alias(self.id_col))
                    .distinct()
                )
        raise TypeError(
            f"{type(self.index).__name__} exposes none of "
            f"corpus()/raw()/banded()"
        )

    def _applied_staged(self) -> DataFrame | None:
        """Staged rows of APPLIED batches only. Un-markered batches
        are the stream's to replay — repair touching them would race
        the replay into duplicates."""
        if not os.path.isdir(self._staged_path):
            return None
        applied = {
            int(n.split("-", 1)[1])
            for n in os.listdir(self._applied_path)
            if n.startswith("batch-") and not n.endswith(".tmp")
        } if os.path.isdir(self._applied_path) else set()
        dirs = [
            os.path.join(self._staged_path, d)
            for d in os.listdir(self._staged_path)
            if d.startswith("_batch_id=")
            and int(d.split("=", 1)[1]) in applied
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def repair(self) -> int:
        """Re-append staged ids missing from the live corpus (an
        append interrupted after its batch's marker). Idempotent;
        returns rows re-appended. One pruned id-column anti-join —
        run on the maintenance cadence, like the index repairs.

        Staged ids that were TOMBSTONED by a later batch are not
        "missing" — they are deleted. Without the tombstone
        anti-join, a staged insert whose id was later taken down
        would be physically re-appended on EVERY repair call (the
        read-side filter would hide it, but the dead bytes would
        grow without bound and a post-compact read would resurrect
        it)."""
        staged = self._applied_staged()
        if staged is None:
            return 0
        staged = tb.filter_live(
            self.spark, self.index.path, staged, col=self.id_col
        )
        missing = staged.join(
            self._live_ids(), self.id_col, "left_anti"
        ).localCheckpoint()
        n = missing.count()
        if n:
            self.index.append(
                missing, id_col=self.id_col, vec_col=self.vec_col
            )
        missing.unpersist()
        return n

    def prune_staged(self) -> int:
        """Drop staged partitions of applied batches whose ids are
        ALL accounted for — live in the corpus OR tombstoned by a
        later delete (a deleted staged id is reconciled, not pending;
        see :meth:`repair`) — markers stay, so replays of pruned
        batches still short-circuit. Returns dirs removed."""
        import shutil

        if not os.path.isdir(self._staged_path):
            return 0
        live = self._live_ids()
        dead = tb.read_tombstones(self.spark, self.index.path)
        if dead is not None:
            live = live.unionByName(
                dead.withColumnRenamed("c_id", self.id_col)
            )
        removed = 0
        for d in sorted(os.listdir(self._staged_path)):
            if not d.startswith("_batch_id="):
                continue
            bid = int(d.split("=", 1)[1])
            if not os.path.exists(self._marker(bid)):
                continue
            leaf = os.path.join(self._staged_path, d)
            staged = self.spark.read.parquet(leaf)
            if staged.join(live, self.id_col, "left_anti").limit(1).count():
                continue  # still has unreconciled ids — keep for repair
            shutil.rmtree(leaf)
            removed += 1
        if removed:
            self.spark.catalog.refreshByPath(self._staged_path)
        return removed

    def lag(self) -> dict:
        """Staged-vs-applied accounting: ``staged_batches``,
        ``applied_batches``, and ``pending`` (staged without a marker
        — batches the stream still owes a replay)."""
        staged = (
            {
                int(d.split("=", 1)[1])
                for d in os.listdir(self._staged_path)
                if d.startswith("_batch_id=")
            }
            if os.path.isdir(self._staged_path)
            else set()
        )
        applied = (
            {
                int(n.split("-", 1)[1])
                for n in os.listdir(self._applied_path)
                if n.startswith("batch-") and not n.endswith(".tmp")
            }
            if os.path.isdir(self._applied_path)
            else set()
        )
        return {
            "staged_batches": len(staged),
            "applied_batches": len(applied),
            "pending": len(staged - applied),
        }
