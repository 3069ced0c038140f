"""Incremental materialization: maintain a current-state table from
change batches — the MERGE INTO / upsert pattern (no Delta in this
environment, so emulated with anti-join + union + atomic directory
swap, the guide-sanctioned composition).

This is the consumer-side complement of replay (cdc/replay.py): replay
folds the WHOLE log each time (O(log)); a materialized table applies
only the new batch (O(batch + table)) — the difference that matters
when the log is 100 TB and the live table is 100 GB.

Scale: the merge is one full-outer-shaped pass — anti-join(target,
batch-keys) keeps untouched rows, the batch's latest non-DELETE images
are unioned in. Both sides shuffle on the PK once; with a PK-bucketed
target the anti-join is co-located. The directory swap gives readers
snapshot isolation (they see old or new, never half).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MaterializedTable:
    """A current-state table maintained by applying envelope batches."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        row_schema: T.StructType,
        pk: str,
    ):
        self.spark = spark
        self.path = path
        self.row_schema = row_schema
        self.pk = pk
        os.makedirs(path, exist_ok=True)

    @property
    def _data(self) -> str:
        return os.path.join(self.path, "current")

    def exists(self) -> bool:
        return os.path.isdir(self._data)

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], schema=self.row_schema)
        return self.spark.read.parquet(self._data)

    def apply_changes(self, envelope_batch: DataFrame) -> None:
        """Upsert one envelope batch (MERGE semantics):

        - last event per PK within the batch wins (ts, event_id order)
        - DELETE → row removed; INSERT/UPDATE → `after` image upserted
        """
        key = F.coalesce(
            F.get_json_object("after", f"$.{self.pk}"),
            F.get_json_object("before", f"$.{self.pk}"),
        )
        w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
        last = (
            envelope_batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        upserts = (
            last.filter(F.col("operation") != "DELETE")
            .select(F.from_json("after", self.row_schema).alias("r"))
            .select("r.*")
        )
        touched_keys = last.select(key.cast("string").alias("_k"))

        target = self.read()
        untouched = target.join(
            touched_keys,
            target[self.pk].cast("string") == touched_keys["_k"],
            "left_anti",
        )
        merged = untouched.unionByName(upserts)

        tmp = self._data + "._new"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(self._data):
            old = self._data + "._old"
            os.rename(self._data, old)
            os.rename(tmp, self._data)
            shutil.rmtree(old)
        else:
            os.rename(tmp, self._data)
