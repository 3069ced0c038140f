#!/usr/bin/env python3
"""Deterministic shard-export scale soak (round 11, VERDICT r10 #5,
operators/sharding.py::write_shards): the pipeline's last step —
global training order + size-balanced output shards + manifest — at
2M packed sequences into 64 shards.

What it proves at scale:

- balance: equal-width hash ranges keep every shard within a few
  percent of the mean (binomial deviation — asserted < ±5% at
  2M/64 ≈ 31k rows/shard);
- global order: shard order-key ranges are strictly increasing and
  disjoint (contiguous slices of the global order — asserted from
  the manifest), and every written parquet file is internally sorted
  by order_key (checked from the files' own pages via pyarrow, not
  from the writer's intent);
- reproducibility: the manifest digests (md5 of identity strings in
  order) recomputed from the WRITTEN files match the manifest — the
  audit contract a trainer-side loader can verify with any engine;
- cost shape: assignment is zero-shuffle map-side; the export is one
  exchange on shard + per-task sort; the manifest is one shard-keyed
  aggregate. Reported rows/s covers assign + write + manifest.

Usage: python soak_shard.py [n_rows] [n_shards]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.sharding import write_shards
from timescale_cdc_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="soak_shard")

    import os
    import shutil
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"soak_shard_{os.getpid()}")
    # packed-sequence stand-ins: a pack id and a payload column
    rows = spark.range(n).select(
        F.concat(F.lit("pack-"), F.col("id").cast("string")).alias(
            "pack_id"
        ),
        F.xxhash64("id").cast("string").alias("payload"),
    )

    t0 = time.perf_counter()
    m = write_shards(rows, out, ["pack_id"], n_shards, salt="soak")
    wall = time.perf_counter() - t0

    counts = [m["shards"][k]["n_rows"] for k in sorted(m["shards"])]
    mean = n / n_shards
    max_dev = max(abs(c - mean) / mean for c in counts)
    # contiguity of the global order across shards
    for k in range(n_shards - 1):
        assert (
            m["shards"][k]["max_order_key"]
            < m["shards"][k + 1]["min_order_key"]
        )
    # physical order inside every written file, from the files
    files_checked = 0
    for k in range(n_shards):
        for f in sorted(pathlib.Path(out, f"shard={k}").glob("*.parquet")):
            keys = pq.read_table(str(f), columns=["order_key"])[
                "order_key"
            ].to_pylist()
            assert keys == sorted(keys), f
            files_checked += 1
    # digest re-verification from the written data (what a loader
    # would run) — one pass over the shard dirs
    re_digest = {
        r["shard"]: r["d"]
        for r in spark.read.parquet(out)
        .groupBy("shard")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("order_key", "pack_id")
                            )
                        ),
                        lambda s: s.getField("pack_id"),
                    ),
                    ",",
                )
            ).alias("d")
        )
        .collect()
    }
    digest_ok = all(
        re_digest[k] == m["shards"][k]["digest"] for k in m["shards"]
    )

    report = {
        "n_rows": n,
        "n_shards": n_shards,
        "wall_s": round(wall, 2),
        "rows_per_s": int(n / wall),
        "shard_rows_min": min(counts),
        "shard_rows_max": max(counts),
        "max_dev_from_mean": round(max_dev, 4),
        "files_checked_sorted": files_checked,
        "digests_reverified": digest_ok,
    }
    print(json.dumps(report))
    assert max_dev < 0.05, report
    assert digest_ok, report
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
