"""Retention + compaction maintenance jobs.

Reference parity: ``add_retention_policy('cdc.event_log',
INTERVAL '7 days')`` (init.sql:71) — a background job that drops whole
time chunks past the horizon. The Spark-native equivalent is
partition-granular directory removal: dropping ``event_date=...``
partitions is O(partitions dropped), never a rewrite of surviving
data — the same property that makes chunk-drop cheap in Timescale.

Compaction handles the small-file problem of frequent micro-batch
appends (SURVEY §4 'append-optimized inserts'): rewrite one date
partition's files into few large ones, newest partitions excluded
(they're still hot).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from timescale_cdc_spark.cdc.log import EventLog


def _partition_dates(log: EventLog) -> list[dt.date]:
    if not os.path.isdir(log.data_path):
        return []
    out = []
    for name in os.listdir(log.data_path):
        if name.startswith("event_date="):
            try:
                out.append(dt.date.fromisoformat(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def apply_retention(
    log: EventLog, horizon_days: int = 7, now: dt.date | None = None
) -> list[dt.date]:
    """Drop event_date partitions strictly older than the horizon
    (init.sql:71's 7-day default). Returns the dropped dates.

    Invariant (tested): never removes a partition younger than the
    horizon — the SURVEY §5 property test.
    """
    today = now or dt.date.today()
    cutoff = today - dt.timedelta(days=horizon_days)
    dropped = []
    for d in _partition_dates(log):
        if d < cutoff:
            shutil.rmtree(
                os.path.join(log.data_path, f"event_date={d.isoformat()}")
            )
            dropped.append(d)
    return dropped


def _recover_dir(part: str) -> bool:
    """Self-heal a partition leaf dir left half-swapped by a crashed
    compaction: if the live dir is missing but a ``._compact_old``
    survivor exists, restore it; stale tmp/old leftovers next to an
    intact live dir are swept. Returns True if a restore happened."""
    old = part + "._compact_old"
    tmp = part + "._compact_tmp"
    restored = False
    if not os.path.isdir(part) and os.path.isdir(old):
        os.rename(old, part)  # crash happened between the two renames
        restored = True
    if os.path.isdir(part):
        for leftover in (old, tmp):
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)
    return restored


def _dir_bytes(part: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(part):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _rewrite_dir(
    log: EventLog,
    part: str,
    target_files: int,
    sort_cols: list[str],
    codec: str | None,
    zkey_fn=None,
    max_records_per_file: int | None = None,
) -> tuple[int, int, int]:
    """Rewrite one partition LEAF dir into ``target_files`` files
    sorted by ``sort_cols`` (optionally re-encoded with ``codec``)
    behind the atomic two-rename swap; recovers a half-swapped crash
    state first. Returns (rows, bytes_before, bytes_after).

    ``zkey_fn`` (round 10): a callable ``df -> Column`` producing the
    z-order sort key; when given, the leaf is range-partitioned and
    sorted on that key instead of ``sort_cols`` (a total order on the
    Morton key across the leaf's output files).
    ``max_records_per_file`` bounds rows per file — the z-order
    pruning granularity knob."""
    _recover_dir(part)
    if not os.path.isdir(part):
        return 0, 0, 0
    df = log.spark.read.parquet(part)
    n = df.count()
    b0 = _dir_bytes(part)
    tmp = part + "._compact_tmp"
    if zkey_fn is not None:
        out = (
            df.withColumn("_zk", zkey_fn(df))
            .repartitionByRange(target_files, "_zk")
            .sortWithinPartitions("_zk")
            .drop("_zk")
        )
    else:
        out = df.coalesce(target_files).sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if codec:
        writer = writer.option("compression", codec)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(tmp)
    b1 = _dir_bytes(tmp)
    old = part + "._compact_old"
    os.rename(part, old)
    os.rename(tmp, part)
    shutil.rmtree(old)
    return n, b0, b1


_LOG_SORT = ["schema_name", "table_name", "ts", "event_id"]

#: Per-chunk layout manifest (round 10, VERDICT r9 #1): lives INSIDE
#: the date-partition dir under an underscore name so every parquet
#: reader ignores it; records the z-order normalization bounds so a
#: later INCREMENTAL rewrite of the same chunk (or a sibling hour
#: leaf) reproduces a comparable Morton key without re-aggregating —
#: the piece layout.py returned but nothing persisted (VERDICT r9
#: observation #2).
_LAYOUT_MANIFEST = "_layout.json"


def read_layout(part: str) -> dict | None:
    """The committed layout manifest of a date-partition dir, or None
    (never written / legacy chunk / swept by a re-sort)."""
    import json

    try:
        with open(os.path.join(part, _LAYOUT_MANIFEST)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _commit_layout(part: str, manifest: dict) -> None:
    """Atomically (re)place the layout manifest — written AFTER every
    leaf swap completed, so a crash mid-rewrite leaves either the old
    manifest with old data (leaf swaps are atomic and recoverable) or
    no/stale manifest with new data, in which case the next run simply
    recomputes bounds and rewrites (idempotent — the same
    crash-at-any-point contract as the compaction swap itself)."""
    import json

    tmp = os.path.join(part, _LAYOUT_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(part, _LAYOUT_MANIFEST))


def _compact_dir(log: EventLog, part: str, target_files: int) -> int:
    """Rewrite one partition LEAF dir into ``target_files`` sorted
    files with an atomic swap; recovers a half-swapped crash state
    first. Returns rows compacted."""
    return _rewrite_dir(log, part, target_files, _LOG_SORT, None)[0]


def _leaf_dirs(date_dir: str) -> list[str]:
    """Partition leaf dirs under one event_date dir: the dir itself
    (day chunking) or its event_hour=NN children (hour chunking).
    ``._compact_old``/``._compact_tmp`` swap survivors are never
    leaves — they are crash debris handled by _recover_leaves."""
    hours = sorted(
        os.path.join(date_dir, name)
        for name in os.listdir(date_dir)
        if name.startswith("event_hour=")
        and "._compact_" not in name
        and os.path.isdir(os.path.join(date_dir, name))
    )
    return hours or [date_dir]


def _recover_leaves(date_dir: str) -> bool:
    """Restore hour leaves whose live dir was lost to a crash between
    _compact_dir's two renames: each ``*._compact_old`` survivor names
    the missing leaf — strip the suffix and _recover_dir the real path
    (restores the live dir and sweeps tmp debris)."""
    restored = False
    for name in os.listdir(date_dir):
        if name.endswith("._compact_old"):
            leaf = os.path.join(date_dir, name[: -len("._compact_old")])
            restored = _recover_dir(leaf) or restored
    return restored


def recover_partition(log: EventLog, date: dt.date) -> bool:
    """Self-heal every leaf of a date partition (see _recover_dir)."""
    part = os.path.join(log.data_path, f"event_date={date.isoformat()}")
    restored = _recover_dir(part)
    if os.path.isdir(part):
        restored = _recover_leaves(part) or restored
        for leaf in _leaf_dirs(part):
            restored = _recover_dir(leaf) or restored
    return restored


def compact_partition(log: EventLog, date: dt.date, target_files: int = 1) -> int:
    """Rewrite one date partition into ``target_files`` sorted files
    per leaf (the whole date dir for day chunking; each event_hour
    sub-chunk for hour chunking — the nested layout is preserved so
    hour-level pruning survives compaction). Returns rows compacted.
    Atomic per leaf; readers never observe a half-written partition.
    A leaf half-swapped by a crashed prior compaction is restored
    first (_recover_leaves) so it is compacted under its real name,
    never as ``._compact_old`` debris."""
    part = os.path.join(log.data_path, f"event_date={date.isoformat()}")
    _recover_dir(part)
    if not os.path.isdir(part):
        return 0
    _recover_leaves(part)
    rows = sum(
        _compact_dir(log, leaf, target_files) for leaf in _leaf_dirs(part)
    )
    # A plain _LOG_SORT rewrite destroys a z-ordered layout exactly
    # like a non-zorder re-compress does — sweep the manifest so no
    # later incremental rewrite trusts stale bounds over re-sorted
    # data (ADVICE r10).
    manifest = os.path.join(part, _LAYOUT_MANIFEST)
    if os.path.exists(manifest):
        os.remove(manifest)
    return rows


def compress_partition(
    log: EventLog,
    date: dt.date,
    segment_by: tuple[str, ...] = ("schema_name", "table_name"),
    order_by: tuple[str, ...] = ("ts", "event_id"),
    codec: str = "zstd",
    target_files: int = 1,
    zorder_by: tuple[str, ...] | None = None,
    zorder_bits: int | None = None,
    max_records_per_file: int | None = None,
) -> dict:
    """Timescale ``compress_chunk`` analog (the compression policy a
    hypertable deployment pairs with the retention policy the
    reference installs, init.sql:71): rewrite a COLD date chunk with
    the two levers that drive columnar compression — row order and
    codec. Sorting by (``segment_by``..., ``order_by``...) clusters
    equal segment values and makes the order columns near-monotone,
    which is exactly what parquet's dictionary/RLE and delta
    encodings want (Timescale's segment_by/order_by semantics,
    re-expressed as a sort because parquet encodes per column chunk);
    ``zstd`` replaces the default snappy for the long-term copy.

    Reads stay fully transparent — parquet files are self-describing,
    so scans, partition pruning, and the hour-chunk layout are
    unchanged (each leaf is rewritten under the same atomic two-rename
    swap as `compact_partition`, crash-recoverable by
    `recover_partition`). Returns {"rows", "bytes_before",
    "bytes_after"} so a policy runner can log the ratio.

    ``zorder_by`` (round 10, VERDICT r9 #1): rewrite the chunk
    Morton-ordered on the listed dimensions instead of the 1-D
    segment/order sort — TimescaleDB's space-partitioning dimension as
    a maintenance policy, so box queries (e.g. table_name × time
    range) open few row groups. The normalization bounds are persisted
    in the chunk's ``_layout.json`` manifest (committed atomically
    AFTER all leaf swaps): a later incremental re-compress of the same
    chunk with the same (zorder_by, bits) reuses them, keeping Morton
    keys comparable across rewrites; out-of-bounds values under stale
    bounds clamp to the key-space edge — pruning degrades, reads never
    break. ``max_records_per_file`` bounds rows per file ⇒ pruning
    granularity. Report gains {"layout", "zorder_by", "bits",
    "bounds", "bounds_source"}.
    """
    part = os.path.join(log.data_path, f"event_date={date.isoformat()}")
    _recover_dir(part)
    if not os.path.isdir(part):
        return {"rows": 0, "bytes_before": 0, "bytes_after": 0}
    _recover_leaves(part)

    zkey_fn = None
    zreport: dict = {}
    if zorder_by:
        from timescale_cdc_spark.operators.layout import (
            compute_bounds,
            default_bits,
            zorder_key_for,
        )

        zcols = list(zorder_by)
        bits = default_bits(len(zcols), zorder_bits)
        prior = read_layout(part)
        if (
            prior
            and prior.get("layout") == "zordered"
            and prior.get("zorder_by") == zcols
            and prior.get("bits") == bits
        ):
            bounds = {c: tuple(v) for c, v in prior["bounds"].items()}
            bounds_source = "manifest"
        else:
            # one O(1)-to-driver aggregate over the whole chunk (all
            # hour leaves) so keys are comparable across leaves
            try:
                bounds = compute_bounds(log.spark.read.parquet(part), zcols)
                bounds_source = "computed"
            except ValueError:
                # empty chunk or all-NULL z column: no defined bounds,
                # so no z-key — fall back to the plain sorted rewrite
                # instead of raising after the caller already decided
                # to compress (ADVICE r10). The non-zorder path below
                # then also sweeps any stale manifest.
                bounds = None
        if bounds is None:
            zorder_by = None
        else:
            def zkey_fn(df, _zc=zcols, _b=bounds, _bits=bits):
                return zorder_key_for(df, _zc, _b, _bits)

            zreport = {
                "layout": "zordered",
                "zorder_by": zcols,
                "bits": bits,
                "bounds": {c: list(v) for c, v in bounds.items()},
                "bounds_source": bounds_source,
            }

    sort_cols = [*segment_by, *order_by]
    rows = before = after = 0
    for leaf in _leaf_dirs(part):
        n, b0, b1 = _rewrite_dir(
            log, leaf, target_files, sort_cols, codec,
            zkey_fn=zkey_fn, max_records_per_file=max_records_per_file,
        )
        rows += n
        before += b0
        after += b1
    if zorder_by:
        _commit_layout(
            part,
            {k: zreport[k] for k in
             ("layout", "zorder_by", "bits", "bounds")},
        )
    elif os.path.exists(os.path.join(part, _LAYOUT_MANIFEST)):
        # a plain segment/order re-compress destroys the z layout —
        # sweep the manifest so no caller trusts stale bounds
        os.remove(os.path.join(part, _LAYOUT_MANIFEST))
    return {
        "rows": rows, "bytes_before": before, "bytes_after": after,
        **zreport,
    }
