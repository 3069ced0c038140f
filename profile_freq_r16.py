#!/usr/bin/env python3
"""Round 16 (VERDICT r15 #7): freq family residual. Decompose the
hourly->daily Misra-Gries chain at sf0.1 and measure whether the
rollup's collect_list + interpreted fold is worth replacing with the
sparse-explode + codegen-agg shape UDDSketch adopted in r15.

Measured pieces (interleaved, noop sink, min/med of reps):
  partials  — freq_partials(ev, hourly) alone;
  chain     — freq_partials + freq_rollup (shipped);
  exploded  — freq_partials + a SMALL-REGIME-ONLY exploded rollup
              (explode mg -> two codegen keyed aggs). Valid only
              when no group ever exceeds max_size distinct items —
              true on this fixture (<=5 event types) — so it brackets
              the BEST case of the restructure, before paying the
              dual-regime split (which needs either a second
              computation of the fact-shuffled partials or a
              materialization).

Identity first: exploded == shipped on the fixture (exceptAll both
ways over exploded map entries). One JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from timescale_cdc_spark.catalog import load_table  # noqa: E402
from timescale_cdc_spark.functions.freq import (  # noqa: E402
    freq_partials,
    freq_rollup,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def exploded_rollup_small_regime(
    partials: DataFrame, key_cols: list[str], width: str
) -> DataFrame:
    """Small-regime-only rollup: when no coarse group ever exceeds
    max_size distinct items, the fold never compresses and the merged
    map is the plain per-item sum with err = sum(err), n = sum(n) —
    codegen all the way to the final map assembly. NOT shipped: the
    general path needs the fold for large groups, and partials feed
    from a fact shuffle that a two-path split would compute twice."""
    secs = 86400 if width == "1 day" else None
    assert secs is not None
    df = partials.selectExpr(
        "*",
        f"cast(floor(unix_timestamp(bucket) / {secs}) as bigint) * {secs}"
        " as _ceb",
    )
    # every partial contributes exactly one carrier row (null item)
    # holding its err/n; mg entries ride alongside
    ex = df.selectExpr(
        *key_cols,
        "_ceb",
        "err",
        "n",
        "explode(concat(map_entries(mg), "
        "array(named_struct('key', cast(null as string), "
        "'value', cast(0 as long))))) as e",
    ).selectExpr(
        *key_cols,
        "_ceb",
        "e.key as _item",
        "e.value as _c",
        "CASE WHEN e.key IS NULL THEN err ELSE cast(0 as long) END as _e",
        "CASE WHEN e.key IS NULL THEN n ELSE cast(0 as long) END as _n",
    )
    l1 = ex.groupBy(*key_cols, "_ceb", "_item").agg(
        F.expr("sum(_c) as _c"),
        F.expr("sum(_e) as _e"),
        F.expr("sum(_n) as _n"),
    )
    l2 = l1.groupBy(*key_cols, "_ceb").agg(
        F.expr(
            "map_from_entries(array_sort(collect_list("
            "CASE WHEN _item IS NOT NULL THEN struct(_item, _c) END)))"
            " as mg"
        ),
        F.expr("sum(_e) as err"),
        F.expr("sum(_n) as n"),
    )
    return l2.selectExpr(
        *key_cols,
        "timestamp_seconds(_ceb) as bucket",
        "mg",
        "err",
        "n",
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="profile_freq_r16")
    ev = load_table(spark, SF_DIR, "events")
    key = ["user_id"]

    def mk_partials():
        return freq_partials(ev, "ts", key, "event_type", "1 hour", 16)

    def chain():
        return freq_rollup(mk_partials(), key, "1 day", 16)

    def exploded():
        return exploded_rollup_small_regime(mk_partials(), key, "1 day")

    # identity (fixture is small-regime: <=5 event types per user)
    a = chain().selectExpr(
        "user_id", "bucket", "err", "n", "explode(mg) as (item, c)"
    )
    b = exploded().selectExpr(
        "user_id", "bucket", "err", "n", "explode(mg) as (item, c)"
    )
    d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
    print(f"identity exploded-vs-fold: exceptAll {d1}/{d2}", flush=True)
    assert d1 == 0 and d2 == 0

    legs = {
        "partials_only": mk_partials,
        "chain_shipped": chain,
        "chain_exploded_smallregime": exploded,
    }
    for fn in legs.values():
        noop(fn())  # warm
    res = {k: [] for k in legs}
    for _ in range(reps):
        for k, fn in legs.items():
            t0 = time.perf_counter()
            noop(fn())
            res[k].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "probe": "freq_rollup_exploded_vs_fold",
        "sf_dir": SF_DIR,
        **{k: {"min": min(v), "med": statistics.median(v), "all": v}
           for k, v in res.items()},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
