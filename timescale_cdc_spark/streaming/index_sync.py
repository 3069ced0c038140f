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

* **INSERT + DELETE natively; UPDATE by policy.** An embedding row is
  content-addressed (the vector IS the content), so a revision is a
  DELETE of the old id plus an INSERT of a new id — never an in-place
  mutation. Allowing in-place updates under id-level tombstones would
  be unsound: tombstoning the old version hides the new one too. The
  reference's envelope stream DOES carry UPDATEs (timescale/
  init.sql:16 lists INSERT/UPDATE/DELETE in TG_OP; readme.md shows
  before+after both populated on UPDATE), so ``updates`` picks the
  policy: ``'reject'`` (default — callers pre-filter the topic to
  INSERT/DELETE) fails the batch on any UPDATE; ``'split'`` rewrites
  an id-CHANGING UPDATE into DELETE(before.id) + INSERT(after) —
  sound, because the two halves are exactly the envelopes a
  well-behaved producer would have sent — and still rejects a SAME-id
  in-place mutation, which no rewrite can make sound under id-level
  tombstones (round 15, VERDICT r14 #5 / ADVICE r14).
* **Validation precedes mutation** (round 15, ADVICE r14): every
  batch-rejecting check — unknown ops, unparseable payloads, and the
  tombstoned-re-insert guard — runs against (pre-batch tombstones ∪
  this batch's delete ids) BEFORE the first write, so a rejected
  batch has ZERO side effects: the stream wedges on the replaying
  ValueError with the index exactly as it was, instead of leaving the
  batch's deletes visible while its inserts never land.
* **Re-inserting a tombstoned id is rejected** until a ``compact()``
  physically purges the old rows — otherwise clearing the tombstone
  would resurrect the OLD row next to the new one. The error says so.
* **Exactly-once deletes, at-most-once appends, repair reconciles.**
  Per micro-batch: (1) the parsed insert rows land in a per-batch
  staging partition (``overwrite`` — idempotent on replay), (2) the
  tombstoned-re-insert guard validates against the effective
  tombstone set (zero mutations yet), (3) deletes apply
  (tombstone-append — idempotent), (4) the applied MARKER commits,
  (5) the appends run from staging. A crash before
  the marker replays the batch through steps 1-4, all idempotent. A
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
    ``updates``: ``'reject'`` (default) or ``'split'`` — see the
    module docstring for the soundness argument.
    """

    def __init__(
        self,
        index,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        updates: str = "reject",
    ):
        if updates not in ("reject", "split"):
            raise ValueError(
                f"updates must be 'reject' or 'split', got {updates!r}"
            )
        self.index = index
        self.spark = index.spark
        self.path = path.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        self.updates = updates
        #: the most recent attach()'d StreamingQuery — repair() and
        #: prune_staged() refuse to run while it is active (the
        #: single-writer contract those maintenance paths require)
        self._query = None

    # -- paths ----------------------------------------------------------

    @property
    def _staged_path(self) -> str:
        return f"{self.path}/staged"

    @property
    def _applied_path(self) -> str:
        return f"{self.path}/applied"

    @property
    def _deleted_path(self) -> str:
        return f"{self.path}/deleted"

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
        Under ``updates='split'`` an UPDATE whose id CHANGES
        contributes its ``before`` id to the deletes and its ``after``
        row to the inserts — the DELETE+INSERT rewrite — while a
        same-id in-place UPDATE still raises (module docstring).
        Raises on any other operation.

        All validation runs as ONE aggregation pass over the batch
        (unknown ops, unparseable insert-side payloads, unparseable
        delete-side ids — a silently dropped takedown would be worse
        than the loud insert failure — and in-place UPDATEs); only
        the error path takes extra jobs to fetch samples."""
        split = self.updates == "split"
        ins_id = F.from_json("after", self._payload_schema())[self.id_col]
        del_id = F.from_json("before", f"{self.id_col} long")[self.id_col]
        is_upd = F.col("operation") == "UPDATE"
        add_side = F.col("operation") == "INSERT"
        del_side = F.col("operation") == "DELETE"
        if split:
            add_side = add_side | is_upd
            del_side = del_side | is_upd
        allowed = ["INSERT", "DELETE"] + (["UPDATE"] if split else [])
        bad_ins = add_side & ins_id.isNull()
        bad_del = del_side & del_id.isNull()
        inplace = (
            is_upd
            & ins_id.isNotNull()
            & del_id.isNotNull()
            & (ins_id == del_id)
            if split
            else F.lit(False)
        )
        stats = envelopes.agg(
            F.collect_set(
                F.when(
                    ~F.col("operation").isin(*allowed),
                    F.col("operation"),
                )
            ).alias("bad_ops"),
            F.sum(bad_ins.cast("int")).alias("n_bad_ins"),
            F.sum(bad_del.cast("int")).alias("n_bad_del"),
            F.sum(inplace.cast("int")).alias("n_inplace"),
        ).first()
        if stats["bad_ops"]:
            hint = (
                "" if split
                else "; id-changing UPDATEs can be auto-rewritten with "
                "updates='split'"
            )
            raise ValueError(
                f"IndexCdcSync consumes INSERT/DELETE envelopes only, "
                f"got {sorted(stats['bad_ops'])}: an embedding row is "
                f"content-addressed — send a revision as DELETE(old id) "
                f"+ INSERT(new id)" + hint
            )
        if stats["n_inplace"]:
            raise ValueError(
                f"{stats['n_inplace']} same-id in-place UPDATE "
                f"envelope(s): no rewrite makes an in-place mutation "
                f"sound under id-level tombstones (tombstoning the old "
                f"version would hide the new one) — the producer must "
                f"send DELETE(old id) + INSERT(new id) with a fresh id"
            )
        if stats["n_bad_ins"]:
            sample = envelopes.filter(bad_ins).select("after").first()
            raise ValueError(
                f"{stats['n_bad_ins']} insert-side envelope(s) with "
                f"unparseable 'after' payloads (need JSON "
                f"{self._payload_schema()!r}); first: {sample['after']!r}"
            )
        if stats["n_bad_del"]:
            sample = envelopes.filter(bad_del).select("before").first()
            raise ValueError(
                f"{stats['n_bad_del']} delete-side envelope(s) with "
                f"unparseable 'before' ids (need JSON with "
                f"{self.id_col!r}); first: {sample['before']!r} — a "
                f"NULL tombstone matches nothing, so the takedown "
                f"would silently never take effect"
            )
        adds = envelopes.filter(add_side).select(
            F.from_json("after", self._payload_schema()).alias("_p")
        ).select(
            F.col(f"_p.{self.id_col}").alias(self.id_col),
            F.col(f"_p.{self.vec_col}").alias(self.vec_col),
        )
        dels = envelopes.filter(del_side).select(
            del_id.alias(self.id_col)
        )
        return adds, dels

    # -- the per-batch apply (foreachBatch body) ---------------------------

    def apply_batch(self, envelopes: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch, already fully applied
        adds, dels = self.parse(envelopes)
        # (1) stage the inserts — overwrite makes replays idempotent,
        # and the append below reads THIS stable copy, not the topic.
        # Staging is NOT index state: an unmarkered staging dir is
        # never read by repair()/prune_staged(), so writing it before
        # the guard below keeps rejection side-effect-FREE on the
        # index while the guard gets a stable frame to join.
        staged_dir = self._staged_batch(batch_id)
        adds.write.mode("overwrite").parquet(staged_dir)
        staged = self.spark.read.parquet(staged_dir)
        # (2) re-insert-of-tombstoned-id guard, BEFORE any index
        # mutation (round 15, ADVICE r14 — validate before mutating):
        # the effective tombstone set is (pre-batch tombstones ∪ this
        # batch's delete ids), so delete+insert of one id in one batch
        # is caught too, and a rejected batch leaves the index
        # untouched — no half-applied deletes visible while the stream
        # wedges on the replaying error. A pure-insert batch against
        # a tombstone-free index skips the join entirely (the
        # tombstones.py zero-overhead contract for the common case).
        dead = tb.read_tombstones(self.spark, self.index.path)
        has_dels = bool(dels.limit(1).count())
        if dead is not None or has_dels:
            dels_ids = dels.select(F.col(self.id_col).alias("c_id"))
            dead = (
                dels_ids if dead is None else dead.unionByName(dels_ids)
            )
            n_dead_adds = staged.join(
                F.broadcast(dead.withColumnRenamed("c_id", self.id_col)),
                self.id_col,
            ).count()
            if n_dead_adds:
                raise ValueError(
                    f"batch {batch_id}: {n_dead_adds} insert id(s) are "
                    f"tombstoned in the index (or deleted by this very "
                    f"batch); run index.compact() to purge the old rows "
                    f"before re-inserting those ids (clearing a "
                    f"tombstone would resurrect the old row next to "
                    f"the new one)"
                )
        # (3) deletes — log-ahead in the SYNC's own deleted record
        # (rows (id, _db=batch id)), then the index tombstone append;
        # both idempotent-on-replay (duplicate log rows are
        # distinct'd at read). The sync-owned log exists because the
        # index's tombstones are CLEARED by its compact(): without
        # it, the interleave (crash-window batch staging id x) →
        # (later batch deletes x) → compact → repair would resurrect
        # x — repair's only record that x was ever deleted died with
        # the tombstone. The log is BATCH-SCOPED because a delete
        # only outranks inserts staged in earlier-or-equal batches:
        # an id legitimately re-inserted after a compact must still
        # be repairable from ITS OWN later batch (round 15, VERDICT
        # r14 #6; pinned by the lifecycle soak and
        # tests/test_index_sync.py).
        if has_dels:
            dels.withColumn("_db", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(self._deleted_path)
            self.spark.catalog.refreshByPath(self._deleted_path)
            self.index.delete(dels, id_col=self.id_col)
        # (4) marker BEFORE the append: a crash past this point can
        # only lose appends (invisible rows repair() re-adds), never
        # double-apply them on replay
        os.makedirs(self._applied_path, exist_ok=True)
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker(batch_id))
        # (5) appends, from staging
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
        self._query = w.start()
        return self._query

    def _require_stream_stopped(self, op: str) -> None:
        """The maintenance paths are SINGLE-WRITER with respect to the
        attached stream (round 15, ADVICE r14): a marker-committed
        batch whose step-5 append is still IN FLIGHT is
        indistinguishable from a crashed one, so a concurrent repair
        would re-append the same rows — duplicates, the one failure
        mode the marker discipline exists to rule out. Enforced for
        the stream this object attached; a stream attached from
        another process is the caller's contract to stop first (same
        single-writer rule as index delete/compact, tombstones.py)."""
        if self._query is not None and self._query.isActive:
            raise RuntimeError(
                f"{op}() requires the attached sync stream to be "
                f"stopped (single-writer): a batch between its marker "
                f"and its append looks crashed while it is merely in "
                f"flight, and repairing it concurrently would "
                f"duplicate its rows"
            )

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

    def _sync_deleted(self) -> DataFrame | None:
        """The sync's deleted log as distinct ``(id, _db)`` rows —
        ``_db`` is the batch that issued the delete — or None. The
        log-ahead record repair/prune consult so an index compact —
        which clears the index's tombstones — can never erase the
        fact that a staged id was later taken down."""
        # heal a GC rewrite interrupted mid-swap (tombstones.py's
        # two-rename discipline; losing this log reopens the
        # resurrection window the log exists to close)
        tb.recover_swap(self._deleted_path)
        if not os.path.isdir(self._deleted_path):
            return None
        return self.spark.read.parquet(self._deleted_path).select(
            self.id_col, "_db"
        ).distinct()

    def _filter_undeleted(self, staged: DataFrame) -> DataFrame:
        """Drop staged rows whose ids are tombstoned in the index OR
        recorded in the sync's deleted log by a LATER-OR-EQUAL batch
        (deleted ≠ missing; an id re-inserted after a compact is
        killable only by deletes that postdate its own staging —
        ``staged`` carries ``_sb``, its staging batch). Tombstones
        need no batch scoping: a tombstone predating a staged batch
        would have rejected that batch at its guard, so a surviving
        tombstone on a staged id always postdates the staging."""
        staged = tb.filter_live(
            self.spark, self.index.path, staged, col=self.id_col
        )
        dead = self._sync_deleted()
        if dead is not None:
            d = dead.withColumnRenamed(self.id_col, "_dead_id")
            staged = staged.join(
                F.broadcast(d),
                (F.col(self.id_col) == F.col("_dead_id"))
                & (F.col("_db") >= F.col("_sb")),
                "left_anti",
            )
        return staged

    def _applied_staged(self) -> DataFrame | None:
        """Staged rows of APPLIED batches only, each tagged with its
        staging batch id ``_sb`` (the deleted-log scoping key).
        Un-markered batches are the stream's to replay — repair
        touching them would race the replay into duplicates."""
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
        # basePath partition discovery parses the `_batch_id=N` dir
        # names into one column of ONE scan relation (bandstore.py's
        # pattern) — a per-dir union would grow the plan linearly
        # with the batch count between prunes (round-15 review)
        return (
            self.spark.read.option("basePath", self._staged_path)
            .parquet(*dirs)
            .withColumn("_sb", F.col("_batch_id").cast("long"))
            .drop("_batch_id")
        )

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
        self._require_stream_stopped("repair")
        staged = self._applied_staged()
        if staged is None:
            return 0
        staged = self._filter_undeleted(staged).drop("_sb")
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
        ALL accounted for — live in the corpus, tombstoned, or in
        the sync's deleted log with a later-or-equal batch id (a
        deleted staged id is reconciled, not pending; see
        :meth:`repair`) — markers stay, so replays of pruned batches
        still short-circuit. The deleted log is then GC'd down to
        ids still staged somewhere (empty staging clears it).
        Returns dirs removed."""
        import shutil

        self._require_stream_stopped("prune_staged")
        if not os.path.isdir(self._staged_path):
            return 0
        live = self._live_ids()
        dead = tb.read_tombstones(self.spark, self.index.path)
        if dead is not None:
            live = live.unionByName(
                dead.withColumnRenamed("c_id", self.id_col)
            )
        sync_dead = self._sync_deleted()
        removed = 0
        remaining: list[str] = []
        for d in sorted(os.listdir(self._staged_path)):
            if not d.startswith("_batch_id="):
                continue
            bid = int(d.split("=", 1)[1])
            leaf = os.path.join(self._staged_path, d)
            if not os.path.exists(self._marker(bid)):
                remaining.append(leaf)
                continue
            accounted = live
            if sync_dead is not None:
                # batch-scoped, like repair: only deletes issued by
                # batch >= bid reconcile THIS dir's staged ids
                accounted = accounted.unionByName(
                    sync_dead.filter(F.col("_db") >= bid).select(
                        self.id_col
                    )
                )
            staged = self.spark.read.parquet(leaf)
            if staged.join(
                accounted, self.id_col, "left_anti"
            ).limit(1).count():
                remaining.append(leaf)
                continue  # still has unreconciled ids — keep for repair
            shutil.rmtree(leaf)
            removed += 1
        if removed:
            self.spark.catalog.refreshByPath(self._staged_path)
        # GC the deleted log down to the ids still staged (the log
        # only exists to keep repair() honest about staged ids; once
        # a batch's staging is pruned, its deletions are fully
        # reconciled history). The rewrite goes through the atomic
        # two-rename swap (tombstones.swap_rewrite) — a plain
        # overwrite deletes-then-writes, and a crash in that window
        # would lose the log and reopen the resurrection window.
        if sync_dead is not None:
            if not remaining:
                shutil.rmtree(self._deleted_path, ignore_errors=True)
                self.spark.catalog.refreshByPath(self._deleted_path)
            elif removed:
                still = sync_dead.join(
                    self.spark.read.parquet(*remaining).select(
                        self.id_col
                    ),
                    self.id_col,
                    "left_semi",
                )
                tb.swap_rewrite(self.spark, self._deleted_path, still)
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
