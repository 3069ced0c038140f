"""Local replica of the driver's DuckDB-oracle correctness check
(SURVEY.md §5 item 1): run a registered Spark query and its DuckDB
oracle SQL over the same parquet fixtures, normalize, and compare
row-count + schema-shape + values exactly.

Used by tests/test_oracle_parity.py so every oracle-paired operator is
validated locally before the driver ever sees it.
"""

from __future__ import annotations

import datetime
import math
import os
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from timescale_cdc_spark.schemas import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every fixture parquet as a view, like the driver does."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all
    columns, dtypes widened (int→int64-nullable, float→float64,
    datetime→datetime64[us] naive)."""
    out = df.copy()
    out.columns = [str(c) for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif s.dtype == object:
            nonnull = s.dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                out[c] = s.map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                )
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


@dataclass
class CompareResult:
    ok: bool
    message: str
    spark_rows: int = 0
    oracle_rows: int = 0


def _values_equal(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare_query(spark: SparkSession, name: str, sf_dir: str) -> CompareResult:
    """Run QUERIES[name] on Spark and ORACLES[name] on DuckDB; compare."""
    from timescale_cdc_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(ORACLES[name]).df()
    finally:
        con.close()

    # The driver's value-hash does NOT strip timezones, so a tz-aware
    # column on one side (e.g. DuckDB to_timestamp → TIMESTAMPTZ) vs a
    # naive one on the other hash-mismatches there even though our
    # normalization below would erase the difference. Fail loudly here.
    for frame, side in ((sdf, "spark"), (odf, "oracle")):
        for c in frame.columns:
            if getattr(frame[c].dtype, "tz", None) is not None:
                return CompareResult(
                    False,
                    f"tz-aware column {c!r} on {side} side: driver hash would "
                    "mismatch; produce naive timestamps on both sides "
                    "(DuckDB: make_timestamp(us) not to_timestamp(s))",
                )

    s, o = _normalize(sdf), _normalize(odf)
    if list(s.columns) != list(o.columns):
        return CompareResult(
            False, f"column mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
        )
    if len(s) != len(o):
        return CompareResult(
            False, f"row-count mismatch: spark={len(s)} oracle={len(o)}", len(s), len(o)
        )
    for c in s.columns:
        sa, oa = s[c].to_numpy(), o[c].to_numpy()
        for i in range(len(sa)):
            va, vb = sa[i], oa[i]
            if (pd.isna(va) if not isinstance(va, tuple) else False) and (
                pd.isna(vb) if not isinstance(vb, tuple) else False
            ):
                continue
            if isinstance(va, tuple) and isinstance(vb, tuple):
                if len(va) == len(vb) and all(
                    _values_equal(x, y) for x, y in zip(va, vb)
                ):
                    continue
            elif _values_equal(va, vb):
                continue
            return CompareResult(
                False,
                f"value mismatch col={c} row={i}: spark={va!r} oracle={vb!r}",
                len(s),
                len(o),
            )
    return CompareResult(True, "ok", len(s), len(o))
