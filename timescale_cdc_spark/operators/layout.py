"""Z-order (Morton-curve) data layout for multi-dimension chunk
exclusion — the analog of TimescaleDB's space-partitioning dimensions
(a hypertable partitioned by time AND a space key serves box queries
from few chunks) and of the OPTIMIZE ZORDER rewrite popularized by
Delta Lake / Databricks (public technique: Morton 1966 interleaved
ordering; row-group min/max pruning is plain Parquet machinery).

Why a sort helps at all: Parquet readers skip a row group when the
query predicate cannot match its column min/max stats. A table sorted
by ONE column prunes perfectly on that column and not at all on any
other; interleaving the bits of TWO (or more) normalized columns and
sorting by the interleaved key gives every listed column partial
locality, so a box predicate (user range × time range) skips most row
groups on BOTH dimensions — the standard multi-dimensional layout
trade.

Shapes at 100 TB:

- the per-column [min, max] normalization bounds are ONE tiny
  aggregate (2 numbers per column to the driver — O(1), not a
  collect of data);
- the z-key is a pure codegen expression (shift/or terms, no Python,
  no UDF);
- the rewrite itself is Spark's ordinary global sort (range exchange)
  + parquet write with bounded rows per file — the same cost class as
  compress_partition's segment/order rewrite, run per cold chunk by a
  maintenance policy, never over the live head;
- query-time pruning is free: it is the Parquet reader's existing
  row-group stats check; nothing custom runs at read time.

``rowgroup_prune_stats`` measures the effect honestly from file
FOOTERS (pyarrow metadata — min/max per row group), so the soak's
"z-order reads N× fewer row groups" claim is computed from the same
stats a real scan consults, not inferred.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "zorder_key",
    "zorder_key_for",
    "zorder_write",
    "compute_bounds",
    "default_bits",
    "rowgroup_prune_stats",
]

#: default bits per dimension in the interleaved key (2 dims × 21
#: bits = 42 bits). ``zorder_write`` caps the default at
#: ``62 // n_dims`` so three-column calls get 20 bits each instead of
#: overflowing BIGINT (ADVICE r9); 2^20 distinct cells per dimension
#: is far beyond row-group granularity either way.
DEFAULT_BITS = 21


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) using the
    provided [lo, hi] bounds (values outside clamp to the edges —
    bounds may come from a stale profile at scale)."""
    span = max(hi - lo, 1e-300)
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.least(
        (clamped * F.lit(float(2 ** bits))).cast("long"),
        F.lit(2 ** bits - 1),
    )


def zorder_key(
    cols: list[Column],
    bits: int = DEFAULT_BITS,
) -> Column:
    """Morton-interleave pre-normalized integer columns (each already
    in [0, 2^bits)) into one BIGINT sort key: bit i of dim d lands at
    position i*len(cols)+d. Pure shift/or expression tree — codegen,
    no Python."""
    n = len(cols)
    if not 1 <= n <= 3:
        raise ValueError("zorder_key interleaves 1-3 dimensions")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} dims overflows BIGINT")
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                ).cast("long")
            )
    return key


def _zcol_exprs(df: DataFrame, cols: list[str]) -> list[Column]:
    """Per-column double expressions the z-key normalizes (timestamps
    by epoch seconds, numerics by cast, strings by xxhash64).

    String dimensions (round 10): hashing has no range locality, but
    clustering rows by hash(value) groups EQUAL values into few row
    groups, so the column's ordinary string min/max footer stats
    become tight and an equality predicate prunes — exactly the shape
    of the reference's (table_name, ts) btree index (init.sql:64-66)
    re-expressed as layout."""
    exprs = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt.startswith("timestamp"):
            exprs.append(F.unix_timestamp(c).cast("double"))
        elif dt == "string":
            exprs.append(F.xxhash64(c).cast("double"))
        else:
            exprs.append(F.col(c).cast("double"))
    return exprs


def compute_bounds(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[float, float]]:
    """Per-column [min, max] normalization bounds — ONE tiny aggregate
    (2 numbers per column to the driver). Raises if any column's
    bounds are undefined (empty frame or all-NULL column) — the z-key
    would otherwise crash opaquely downstream (ADVICE r9)."""
    exprs = _zcol_exprs(df, cols)
    row = df.agg(
        *[f(e).alias(f"{tag}{i}")
          for i, e in enumerate(exprs)
          for tag, f in (("lo", F.min), ("hi", F.max))]
    ).collect()[0]
    bounds = {}
    for i, c in enumerate(cols):
        lo, hi = row[f"lo{i}"], row[f"hi{i}"]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column {c!r} has no min/max bounds "
                "(empty input or all-NULL column)"
            )
        bounds[c] = (lo, hi)
    return bounds


def zorder_key_for(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int,
) -> Column:
    """The Morton sort key over ``cols`` under the given normalization
    bounds — shared by ``zorder_write`` and incremental maintenance
    rewrites (same bounds ⇒ keys comparable across separate rewrites
    of sibling chunks)."""
    exprs = _zcol_exprs(df, cols)
    ints = [
        _normalize(e, *bounds[c], bits) for c, e in zip(cols, exprs)
    ]
    return zorder_key(ints, bits)


def default_bits(n_cols: int, bits: int | None = None) -> int:
    """Resolve the per-dimension bit width: an explicit ``bits``
    passes through (zorder_key still validates overflow); the default
    is DEFAULT_BITS capped so ``n_cols`` dimensions fit a BIGINT."""
    if bits is not None:
        return bits
    return min(DEFAULT_BITS, 62 // max(n_cols, 1))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int | None = None,
    max_records_per_file: int = 50_000,
) -> dict[str, tuple[float, float]]:
    """Rewrite ``df`` to ``path`` ordered by the z-key over ``cols``
    (numeric/timestamp; timestamps are z-ordered by epoch seconds).
    Returns the normalization bounds used, so a reader (or a later
    incremental rewrite) can reproduce the key. ``max_records_per_file``
    bounds rows per file ⇒ per row group, which sets the pruning
    granularity. ``bits=None`` (default) uses DEFAULT_BITS capped to
    fit ``len(cols)`` dimensions in a BIGINT."""
    bits = default_bits(len(cols), bits)
    bounds = compute_bounds(df, cols)
    (
        df.withColumn("_zk", zorder_key_for(df, cols, bounds, bits))
        # range-partition on the key (one global-sort exchange), then
        # sort within each partition: together a total order on _zk
        .repartitionByRange("_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    return bounds


def rowgroup_prune_stats(
    path: str,
    predicates: dict[str, tuple[object, object]],
) -> tuple[int, int]:
    """(row groups a stats-pruning reader must open, total row groups)
    for a conjunctive box predicate {col: (lo, hi)} — computed from
    the parquet footers' per-row-group min/max, i.e. exactly the
    stats a real scan consults. Driver-side metadata only; reads no
    data pages."""
    import datetime as _dt
    import pathlib

    import pyarrow.parquet as pq

    def _cmp(v):
        # parquet TIMESTAMP stats come back tz-aware (UTC); accept
        # naive predicate bounds by comparing in naive UTC
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v

    must_open = total = 0
    # rglob: also covers Hive-partitioned layouts (part dirs)
    for f in sorted(pathlib.Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        names = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        for rg in range(md.num_row_groups):
            total += 1
            overlap = True
            for col, (lo, hi) in predicates.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → reader must open
                if _cmp(st.max) < _cmp(lo) or _cmp(st.min) > _cmp(hi):
                    overlap = False
                    break
            must_open += int(overlap)
    return must_open, total
