"""Persisted IVF-Flat index (SURVEY.md §2 C3, the build-once scale
path).

``ivf_topk`` (operators/similarity.py) re-fits KMeans on every query
call — fine for a one-shot query, but the coarse quantizer fit
dominates wall-clock as soon as the corpus is large or queries repeat
(measured in SCALE.md: 66 s of a 78 s 1M-vector query run was KMeans).
A real deployment builds the index ONCE and serves many query batches
from it. ``IvfIndex`` materializes exactly what FAISS's IVF-Flat
keeps in RAM, as two parquet tables:

    <path>/centroids/          (_cell int, _centroid array<double>)
    <path>/corpus/_cell=<k>/   (c_id long, c_vec array<float>)

The corpus is disk-partitioned by cell, so a probe of ``n_probe``
cells is a PARTITION-PRUNED scan — at 100 TB the query side reads
``n_probe / n_clusters`` of the bytes, not a filtered full scan. The
centroid table is tiny (n_clusters rows) and rides in a broadcast
join; plan size stays O(1) in cluster count.

Reference parity: the reference has no ANN surface (its embedding
columns never existed); this is part of the training-data-pipeline
extension mandated alongside SURVEY §2.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.similarity import _cosine_for


class IvfIndex:
    """Build-once / query-many IVF-Flat index over an embedding table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    @property
    def _centroids_path(self) -> str:
        return f"{self.path}/centroids"

    @property
    def _corpus_path(self) -> str:
        return f"{self.path}/corpus"

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/meta"

    # -- build ---------------------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_clusters: int = 16,
        seed: int = 42,
        sample_fraction: float | None = None,
    ) -> "IvfIndex":
        """Fit the coarse quantizer and materialize the index.

        ``sample_fraction`` fits KMeans on a sample (the standard move
        at billion-vector scale — the quantizer needs cluster SHAPES,
        not every point); assignment still covers the full corpus.
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv"),
        )
        fit_input = (
            vecs.sample(fraction=sample_fraction, seed=seed)
            if sample_fraction
            else vecs
        )
        km = KMeans(
            k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="_cell"
        )
        model = km.fit(fit_input)

        cent = self.spark.createDataFrame(
            [
                (ci, [float(x) for x in np.asarray(c)])
                for ci, c in enumerate(model.clusterCenters())
            ],
            schema="_cell int, _centroid array<double>",
        )
        cent.coalesce(1).write.mode("overwrite").parquet(self._centroids_path)

        assigned = model.transform(vecs).select("c_id", "c_vec", "_cell")
        (
            assigned.write.mode("overwrite")
            .partitionBy("_cell")
            .parquet(self._corpus_path)
        )

        # Build-time stats for the staleness signal: corpus size and
        # mean quantization error (mean L2² to the assigned centroid).
        stats = (
            self.corpus()
            .join(F.broadcast(self.centroids()), "_cell")
            .agg(
                F.count("*").alias("n_at_build"),
                F.avg(self._l2_sq(F.col("c_vec"))).alias("qerr_at_build"),
            )
            .withColumn("n_clusters", F.lit(n_clusters))
        )
        stats.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        return self

    @staticmethod
    def _l2_sq(vec: F.Column) -> F.Column:
        """Squared L2 distance between a vector column and the
        ``_centroid`` column it is joined with."""
        return F.aggregate(
            F.zip_with(
                vec,
                F.col("_centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # -- maintenance ---------------------------------------------------------

    def append(
        self,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Absorb inserts WITHOUT refitting the quantizer: assign each
        new vector to its nearest existing centroid (broadcast join +
        per-vector rank — the exact rule ``model.transform`` applied at
        build time) and append into that cell's partition directory.

        This is how a CDC-fed index stays queryable between rebuilds —
        an insert batch is one broadcast join + one partition-local
        append, never a corpus rewrite. Recall degrades only as the
        data distribution drifts away from the frozen centroids; the
        drift is observable via :meth:`staleness`, which is the rebuild
        trigger. Caller contract: ids in ``new_vectors`` are new (the
        CDC upsert path dedupes upstream); appending an existing id
        would shadow nothing and surface both rows.
        """
        v = new_vectors.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        )
        scored = v.crossJoin(F.broadcast(self.centroids())).withColumn(
            "_dist", self._l2_sq(F.col("c_vec"))
        )
        w = Window.partitionBy("c_id").orderBy(F.asc("_dist"), F.asc("_cell"))
        assigned = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("c_id", "c_vec", "_cell")
        )
        (
            assigned.write.mode("append")
            .partitionBy("_cell")
            .parquet(self._corpus_path)
        )

    def staleness(self) -> dict:
        """Rebuild signal for the maintenance loop. Returns:

        - ``appended_fraction``: share of the corpus appended since the
          last build — the primary trigger (appends are assigned to
          FROZEN centroids, so quantizer quality decays with this).
        - ``qerr_ratio``: current mean quantization error over the
          build-time mean — detects distribution DRIFT even at low
          append volume (new vectors far from every centroid).
        - ``cell_imbalance``: max cell size / mean cell size — a hot
          cell degrades probe cost even when recall holds.
        - ``rebuild_recommended``: True once appended_fraction > 0.25
          or qerr_ratio > 1.5.

        One pruned-free corpus scan (count + one agg) — cheap relative
        to a rebuild's KMeans fit; run it on the maintenance cadence,
        not per query.
        """
        meta = self.spark.read.parquet(self._meta_path).collect()[0]
        cur = (
            self.corpus()
            .join(F.broadcast(self.centroids()), "_cell")
            .groupBy("_cell")
            .agg(
                F.count("*").alias("n"),
                F.sum(self._l2_sq(F.col("c_vec"))).alias("qerr_sum"),
            )
            .agg(
                F.sum("n").alias("n_now"),
                (F.sum("qerr_sum") / F.sum("n")).alias("qerr_now"),
                (F.max("n") / F.avg("n")).alias("cell_imbalance"),
            )
            .collect()[0]
        )
        appended_fraction = (cur["n_now"] - meta["n_at_build"]) / cur["n_now"]
        qerr_ratio = (
            cur["qerr_now"] / meta["qerr_at_build"]
            if meta["qerr_at_build"]
            else 1.0
        )
        return {
            "n_at_build": meta["n_at_build"],
            "n_now": cur["n_now"],
            "appended_fraction": appended_fraction,
            "qerr_ratio": qerr_ratio,
            "cell_imbalance": cur["cell_imbalance"],
            "rebuild_recommended": bool(
                appended_fraction > 0.25 or qerr_ratio > 1.5
            ),
        }

    # -- query ---------------------------------------------------------------

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._centroids_path)

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self._corpus_path)

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        engine: str = "jvm",
    ) -> DataFrame:
        """Approximate top-K from the persisted index.

        Probe assignment is a broadcast join against the centroid
        table; the corpus read is filtered on the partition column
        ``_cell`` so only probed cell directories are scanned
        (PartitionFilters in the plan — asserted in tests).
        ``engine='arrow'`` uses the numpy-batched re-rank scorer
        (similarity.cosine_arrow) — the throughput path once probes
        touch millions of candidates."""
        q = queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        l2 = F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("_centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored_cells = q.crossJoin(F.broadcast(self.centroids())).withColumn(
            "_dist", l2
        )
        wp = Window.partitionBy("q_id").orderBy(F.asc("_dist"), F.asc("_cell"))
        probes = (
            scored_cells.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= n_probe)
            .select("q_id", "q_vec", "_cell")
        )
        # Partition pruning needs literal cell values at planning time:
        # collect ONLY the probed cell ids (≤ n_probe × |queries| ints,
        # tiny by construction — queries are the small broadcast side).
        cells = sorted(
            r["_cell"] for r in probes.select("_cell").distinct().collect()
        )
        pruned = self.corpus().filter(F.col("_cell").isin(cells))
        cand = pruned.join(
            F.broadcast(probes),
            (pruned["_cell"] == probes["_cell"])
            & (F.col("c_id") != F.col("q_id")),
        ).select("q_id", "q_vec", "c_id", "c_vec")
        scored = cand.withColumn(
            "cos", F.round(_cosine_for(engine)(F.col("q_vec"), F.col("c_vec")), 4)
        )
        w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cos", "rank")
        )
