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
) -> tuple[int, int, int]:
    """Rewrite one partition LEAF dir into ``target_files`` files
    sorted by ``sort_cols`` (optionally re-encoded with ``codec``)
    behind the atomic two-rename swap; recovers a half-swapped crash
    state first. Returns (rows, bytes_before, bytes_after)."""
    _recover_dir(part)
    if not os.path.isdir(part):
        return 0, 0, 0
    df = log.spark.read.parquet(part)
    n = df.count()
    b0 = _dir_bytes(part)
    tmp = part + "._compact_tmp"
    writer = (
        df.coalesce(target_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
    )
    if codec:
        writer = writer.option("compression", codec)
    writer.parquet(tmp)
    b1 = _dir_bytes(tmp)
    old = part + "._compact_old"
    os.rename(part, old)
    os.rename(tmp, part)
    shutil.rmtree(old)
    return n, b0, b1


_LOG_SORT = ["schema_name", "table_name", "ts", "event_id"]


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
    return sum(_compact_dir(log, leaf, target_files) for leaf in _leaf_dirs(part))


def compress_partition(
    log: EventLog,
    date: dt.date,
    segment_by: tuple[str, ...] = ("schema_name", "table_name"),
    order_by: tuple[str, ...] = ("ts", "event_id"),
    codec: str = "zstd",
    target_files: int = 1,
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
    """
    part = os.path.join(log.data_path, f"event_date={date.isoformat()}")
    _recover_dir(part)
    if not os.path.isdir(part):
        return {"rows": 0, "bytes_before": 0, "bytes_after": 0}
    _recover_leaves(part)
    sort_cols = [*segment_by, *order_by]
    rows = before = after = 0
    for leaf in _leaf_dirs(part):
        n, b0, b1 = _rewrite_dir(log, leaf, target_files, sort_cols, codec)
        rows += n
        before += b0
        after += b1
    return {"rows": rows, "bytes_before": before, "bytes_after": after}
