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
- reproducibility: the CHUNKED manifest digests (round 12, VERDICT
  r11 #1 — md5 per fixed-size row_number chunk, then md5 of the
  ordered chunk digests; every aggregation buffer bounded by
  digest_chunk_rows, never a whole shard) recomputed from the
  WRITTEN files IN DUCKDB match the manifest — the audit contract a
  trainer-side loader can verify with any engine, with bounded
  per-group state at any shard size;
- cost shape: assignment is zero-shuffle map-side; the export is one
  exchange on shard + per-task sort; the manifest is a pruned
  read-back of the written files (never a second evaluation of the
  input lineage) + one windowed chunk numbering + two bounded
  aggregations. Reported rows/s covers assign + write + manifest.

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
    # chunk size well below rows/shard (~31k at 2M/64) so every shard
    # digests through MULTIPLE bounded chunks, not the degenerate
    # one-chunk case
    m = write_shards(rows, out, ["pack_id"], n_shards, salt="soak",
                     digest_chunk_rows=8192)
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
    # chunked-digest re-verification from the written data IN DUCKDB
    # (what a trainer-side loader in another engine would run): md5
    # per row_number chunk, then md5 of the ordered chunk digests —
    # per-group state bounded by digest_chunk_rows at any shard size
    import duckdb

    chunk_rows = m["digest_chunk_rows"]
    con = duckdb.connect()
    re_digest = {
        int(s): d
        for s, d in con.execute(
            f"""
            WITH r AS (
              SELECT shard, order_key, pack_id AS key,
                     (row_number() OVER (PARTITION BY shard
                        ORDER BY order_key, pack_id) - 1)
                       // {chunk_rows} AS chunk
              FROM read_parquet('{out}/shard=*/*.parquet',
                                hive_partitioning=true)
            ), c AS (
              SELECT shard, chunk,
                     md5(string_agg(key, ',' ORDER BY order_key, key))
                       AS cd
              FROM r GROUP BY shard, chunk
            )
            SELECT shard, md5(string_agg(cd, ',' ORDER BY chunk))
            FROM c GROUP BY shard
            """
        ).fetchall()
    }
    con.close()
    digest_ok = all(
        re_digest.get(k) == m["shards"][k]["digest"]
        for k in m["shards"]
        if m["shards"][k]["n_rows"] > 0
    )
    n_chunks_total = sum(s["n_chunks"] for s in m["shards"].values())

    report = {
        "n_rows": n,
        "n_shards": n_shards,
        "wall_s": round(wall, 2),
        "rows_per_s": int(n / wall),
        "shard_rows_min": min(counts),
        "shard_rows_max": max(counts),
        "max_dev_from_mean": round(max_dev, 4),
        "files_checked_sorted": files_checked,
        "digest_chunk_rows": chunk_rows,
        "n_chunks_total": n_chunks_total,
        "digests_reverified_duckdb": digest_ok,
    }
    print(json.dumps(report))
    assert max_dev < 0.05, report
    assert digest_ok, report
    # chunking actually engaged: > 1 chunk per shard on average
    assert n_chunks_total > n_shards, report
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
