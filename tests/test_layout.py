"""Z-order layout (operators/layout.py): bit-interleave correctness
against a pure-Python Morton reference, write round-trip equality,
and the pruning property the layout exists for — a stats-consulting
reader opens FEWER row groups for box predicates than a single-column
sort, measured from real parquet footers.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.layout import (
    rowgroup_prune_stats,
    zorder_key,
    zorder_write,
)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023) for y in (0, 3, 512, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 10), (r["x"], r["y"])


def test_zorder_key_validates(spark):
    with pytest.raises(ValueError):
        zorder_key([], bits=10)
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], bits=32)  # 64 bits > BIGINT


def test_zorder_write_three_dims_default_bits(spark, tmp_path):
    """Three z-columns at default bits must work (ADVICE r9: 3×21=63
    overflowed BIGINT; the default now caps at 62//3=20 bits/dim)."""
    from timescale_cdc_spark.operators.layout import default_bits

    assert default_bits(3) == 20
    assert default_bits(2) == 21
    assert default_bits(3, bits=7) == 7  # explicit passes through
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("a"),
        (F.col("id") % 7).alias("b"),
        (F.col("id") % 3).alias("c"),
    )
    bounds = zorder_write(df, str(tmp_path / "z3"), ["a", "b", "c"])
    assert set(bounds) == {"a", "b", "c"}
    assert spark.read.parquet(str(tmp_path / "z3")).count() == 1000


def test_zorder_write_rejects_unbounded_columns(spark, tmp_path):
    """Empty input / all-NULL z column → a clear ValueError naming the
    column, not an opaque None-arithmetic TypeError (ADVICE r9)."""
    empty = spark.range(0).select(F.col("id").alias("a"))
    with pytest.raises(ValueError, match="'a'"):
        zorder_write(empty, str(tmp_path / "e"), ["a"])
    nulls = spark.range(5).select(
        F.col("id").alias("a"), F.lit(None).cast("long").alias("b")
    )
    with pytest.raises(ValueError, match="'b'"):
        zorder_write(nulls, str(tmp_path / "n"), ["a", "b"])


@pytest.fixture(scope="module")
def boxed(spark, tmp_path_factory):
    """200k rows over (user_id 0..999, 10 days of ts), written both
    z-ordered and ts-sorted with 5k-row files."""
    base = tmp_path_factory.mktemp("zorder")
    df = spark.range(200_000).select(
        F.abs(F.xxhash64("id") % 1000).alias("user_id"),
        F.timestamp_seconds(
            1704067200 + F.abs(F.xxhash64("id", F.lit(1)) % (86400 * 10))
        ).alias("ts"),
        F.col("id").alias("payload"),
    )
    bounds = zorder_write(
        df, str(base / "z"), ["user_id", "ts"], max_records_per_file=5000
    )
    (
        df.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 5000)
        .parquet(str(base / "linear"))
    )
    return df, base, bounds


def test_zorder_write_round_trips(spark, boxed):
    df, base, bounds = boxed
    back = spark.read.parquet(str(base / "z"))
    assert back.count() == 200_000
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    assert bounds["user_id"][0] == 0.0


def test_zorder_prunes_both_dimensions(spark, boxed):
    _, base, _ = boxed
    t_lo, t_hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4)
    box = {"user_id": (100, 150), "ts": (t_lo, t_hi)}
    z_open, z_total = rowgroup_prune_stats(str(base / "z"), box)
    l_open, l_total = rowgroup_prune_stats(str(base / "linear"), box)
    # the z layout must actually prune, substantially
    assert z_open < z_total / 2
    # on the NON-sort dimension the linear layout cannot prune at all
    u_only = {"user_id": (100, 150)}
    zu_open, zu_total = rowgroup_prune_stats(str(base / "z"), u_only)
    lu_open, lu_total = rowgroup_prune_stats(str(base / "linear"), u_only)
    assert lu_open == lu_total  # ts-sorted: user predicate opens all
    assert zu_open < zu_total / 2  # z-order: prunes on user too


def test_written_timestamps_carry_rowgroup_stats(spark, boxed):
    """The INT96→TIMESTAMP_MICROS session default exists so written
    time columns have min/max stats at all — pin it: every row group's
    ts column must report has_min_max."""
    import pathlib

    import pyarrow.parquet as pq

    _, base, _ = boxed
    files = sorted(pathlib.Path(str(base / "z")).glob("*.parquet"))
    assert files
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }["ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
