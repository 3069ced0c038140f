"""Deterministic final-order shuffle + sharded output manifest — the
last step every public pretraining pipeline runs before the trainer
reads (round 11, VERDICT r10 #5): packed sequences get a reproducible
GLOBAL training order and are split into size-balanced output shards,
with a manifest (per-shard counts, order-key ranges, content digests)
that any engine can re-derive.

Design — everything is a pure function of (row identity, salt), the
operators/sampling.py contract:

- ``order_key`` = the portable 60-bit ``det_hash`` of the row's
  identity columns — sorting by it IS the deterministic global
  shuffle (a hash of the identity is exactly how public pipelines
  derive a reproducible permutation without RNG state);
- ``shard`` = ``order_key`` integer-divided into ``n_shards``
  equal-width hash ranges (last shard takes the remainder edge).
  Ranges, not hash-mod: shards are CONTIGUOUS slices of the global
  order, so a trainer streaming shard 0, 1, 2, … visits rows in
  exactly the global shuffled order, and shard boundaries double as
  order-key range proofs in the manifest. Uniform hash ⇒ shards are
  size-balanced in expectation (binomial deviation ~ sqrt(n/s)).

Integer division keeps the assignment exact: a 60-bit key does not
fit a double's 53-bit mantissa, so float division could misassign
boundary keys — both the Spark side and the SQL re-derivation use
integer ``DIV``/``//``.

100 TB shape: assignment is a zero-shuffle map-side projection (one
sha2 per row); the write is ONE exchange on ``shard`` + a per-task
sort — the same cost class as any partitioned sink — and the manifest
aggregate is one ``shard``-keyed pass whose digest is an ordered
``string_agg`` (bounded per shard by rows/shard). Nothing global,
nothing driver-side beyond the n_shards-row manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.sampling import (
    HASH_SPACE,
    det_hash,
    det_hash_sql,
)

__all__ = [
    "assign_shards",
    "shard_expr_sql",
    "write_shards",
    "read_shard_manifest",
]

#: Manifest file name inside the shard root (underscore-prefixed so
#: parquet readers ignore it, like _layout.json).
_MANIFEST = "_shards.json"


def _shard_width(n_shards: int) -> int:
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return HASH_SPACE // n_shards


def assign_shards(
    df: DataFrame,
    on: list[str],
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    order_col: str = "order_key",
) -> DataFrame:
    """Attach the deterministic global order key and contiguous-range
    shard id. Pure map-side projection — zero shuffle; re-derivable
    in SQL via :func:`shard_expr_sql`."""
    width = _shard_width(n_shards)
    h = det_hash(on, salt)
    out = df.withColumn(order_col, h)
    # integer division (DIV) — float division would misassign
    # boundary keys (60-bit key vs 53-bit double mantissa)
    shard = F.least(
        F.expr(f"{order_col} DIV {width}").cast("int"),
        F.lit(n_shards - 1),
    )
    return out.withColumn(shard_col, shard)


def shard_expr_sql(on: list[str], n_shards: int, salt: str = "") -> tuple[str, str]:
    """(order_key_sql, shard_sql) as ANSI/DuckDB text re-deriving the
    exact assignment — the oracle/audit contract, like det_hash_sql."""
    width = _shard_width(n_shards)
    h = det_hash_sql(on, salt)
    return h, f"least(({h}) // {width}, {n_shards - 1})"


def write_shards(
    df: DataFrame,
    path: str,
    on: list[str],
    n_shards: int,
    salt: str = "",
    max_records_per_file: int | None = None,
) -> dict:
    """Materialize ``df`` as ``shard=K/`` parquet dirs in the
    deterministic global order and commit the manifest. Each shard's
    rows are written sorted by ``order_key`` (one exchange on shard,
    per-task sort), so reading shard dirs in index order streams the
    global order. Returns the manifest dict:

    ``{"n_shards", "on", "salt", "shards": {k: {"n_rows",
    "min_order_key", "max_order_key", "digest"}}}``

    where ``digest`` = md5 of the shard's identity strings joined by
    ',' in order — re-derivable in any engine as
    ``md5(string_agg(key, ',' ORDER BY order_key, key))``."""
    assigned = assign_shards(df, on, n_shards, salt)
    # same NULL-sentinel identity string as det_hash, so the digest
    # is unambiguous under NULL identity parts and SQL-re-derivable
    key_str = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x1e"))
            for c in on
        ],
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option(
            "maxRecordsPerFile", max_records_per_file or 0
        )
        .parquet(path)
    )
    stats = (
        assigned.select(
            "shard", "order_key", key_str.alias("_key")
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("order_key").alias("min_order_key"),
            F.max("order_key").alias("max_order_key"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("order_key", "_key")
                            )
                        ),
                        lambda s: s.getField("_key"),
                    ),
                    ",",
                )
            ).alias("digest"),
        )
        .collect()
    )
    shards = {
        int(r["shard"]): {
            "n_rows": r["n_rows"],
            "min_order_key": r["min_order_key"],
            "max_order_key": r["max_order_key"],
            "digest": r["digest"],
        }
        for r in stats
    }
    # a shard with no rows writes no partition dir and emits no stats
    # row — record it explicitly (n_rows=0, digest None) so a loader
    # iterating shard ids 0..n_shards-1 reads a complete manifest
    # instead of KeyError'ing on small inputs
    for k in range(n_shards):
        shards.setdefault(
            k,
            {
                "n_rows": 0,
                "min_order_key": None,
                "max_order_key": None,
                "digest": None,
            },
        )
    manifest = {
        "n_shards": n_shards,
        "on": list(on),
        "salt": salt,
        "shards": shards,
    }
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return manifest


def read_shard_manifest(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    m["shards"] = {int(k): v for k, v in m["shards"].items()}
    return m
