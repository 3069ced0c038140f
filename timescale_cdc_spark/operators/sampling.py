"""Deterministic, engine-portable dataset splitting and sampling —
the train/val/test machinery a 100 TB training-data pipeline needs to
be REPRODUCIBLE: every assignment is a pure function of (row
identity, salt), so the same row lands in the same split on any
cluster size, any partitioning, any day, and can be re-derived by any
engine that has SHA-256 (the tests re-derive every assignment in
DuckDB and compare exactly).

Why not ``df.randomSplit``/``sample``: those seed per-partition RNGs,
so assignments change with partitioning/cluster layout — useless for
an audit trail ("which split was this document in when we trained?")
and for incremental pipelines (a re-run must not shuffle documents
across splits). The hash route costs one sha2 per row, map-side only.

Hash: the first 15 hex chars (60 bits) of ``sha2(concat(identity,
salt), 256)`` parsed as a BIGINT — chosen because the identical value
is computable in Spark (``conv(substr(sha2(x,256),1,15),16,10)``)
and DuckDB (``CAST('0x' || substr(sha256(x),1,15) AS BIGINT)``),
verified bit-equal cross-engine by tests.

Scale shape: `hash_split` and `stratified_sample` are pure
projections/filters — zero shuffles, stream through any size.
`reservoir_per_group` is one (group) exchange whose rank-filter plans
as WindowGroupLimit (partial per-partition top-k before the shuffle —
pinned by a plan test), so a hot group costs k per upstream
partition, not its full row count, in the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 16^15 — the size of the 60-bit hash space.
HASH_SPACE = 16 ** 15

#: Unit separator — joins identity columns so ("ab","c") != ("a","bc").
_SEP = "\x1f"

#: NULL sentinel — concat_ws silently SKIPS nulls, so without it two
#: rows differing only in WHICH identity column is NULL would build
#: the same identity string and always land in the same split/sample.
#: Record separator: never appears in normal text; a real value equal
#: to it would collide (documented, not guarded).
#:
#: CHANGELOG (round 8, ADVICE r8): introducing this sentinel CHANGED
#: the hash — and therefore the split/sample/reservoir assignment —
#: for any row whose identity columns contain a NULL. Rows with fully
#: non-NULL identities are unaffected. Re-deriving a pre-round-8
#: train/val/test assignment for NULL-keyed rows requires the old
#: (sentinel-free) identity string; going forward, assignments are
#: stable under this definition.
_NULL = "\x1e"


def det_hash(on: list[str], salt: str = "") -> Column:
    """The portable 60-bit hash in [0, HASH_SPACE) as a LONG column:
    first 15 hex chars of sha256 over the identity columns (cast to
    string, NULLs replaced by a sentinel, unit-separator-joined) plus
    the salt."""
    ident = F.concat_ws(
        _SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in on],
        F.lit(salt),
    )
    return F.conv(F.substring(F.sha2(ident, 256), 1, 15), 16, 10).cast(
        "long"
    )


def det_hash_sql(on: list[str], salt: str = "") -> str:
    """The SAME hash as ANSI/DuckDB SQL text (for oracles and for
    re-deriving assignments outside Spark)."""
    cols = ", ".join(
        [f"coalesce(CAST({c} AS VARCHAR), chr(30))" for c in on]
    )
    ident = f"concat_ws(chr(31), {cols}, '{salt}')"
    return f"CAST(('0x' || substr(sha256({ident}), 1, 15)) AS BIGINT)"


def hash_split(
    df: DataFrame,
    on: list[str],
    splits: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given
    weights (must sum to 1 within 1e-9): ``{"train": .98, "val": .01,
    "test": .01}``. Deterministic in (identity, salt); disjoint and
    exhaustive by construction (half-open hash intervals covering the
    space); independent of partitioning and cluster layout."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in splits.values()):
        raise ValueError("split weights must be non-negative")
    h = det_hash(on, salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        bound = int(cum * HASH_SPACE)
        branch = F.when(h < F.lit(bound), F.lit(name))
        expr = branch if expr is None else expr.when(
            h < F.lit(bound), F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    on: list[str],
    fractions: float | dict[str, float],
    salt: str = "",
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash falls
    below ``fraction`` of the space. With ``strata_col`` +
    a dict, each stratum gets its own fraction (absent strata keep
    0) — the reproducible ``sampleBy``. Pure filter, no shuffle."""
    h = det_hash(on, salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        bound = None
        for value, frac in fractions.items():
            b = F.when(
                F.col(strata_col) == F.lit(value),
                F.lit(int(frac * HASH_SPACE)),
            )
            bound = b if bound is None else bound.when(
                F.col(strata_col) == F.lit(value),
                F.lit(int(frac * HASH_SPACE)),
            )
        bound = bound.otherwise(F.lit(0))
    else:
        if strata_col is not None:
            raise ValueError("strata_col needs per-stratum fractions")
        bound = F.lit(int(fractions * HASH_SPACE))
    return df.where(h < bound)


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    on: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform-without-replacement sample of (up to)
    ``k`` rows per group: the k smallest hashes win. Equivalent in
    distribution to a per-group reservoir over a random arrival
    order, but reproducible and order-free. One (group) exchange;
    the rank filter plans as WindowGroupLimit so each upstream
    partition forwards at most k candidates per group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = det_hash(on, salt)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_h"), *[F.col(c) for c in on]
    )
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_h", "_rk")
    )


def mixture_epochs(
    df: DataFrame,
    source_col: str,
    epochs: dict[str, float],
    on: list[str],
    salt: str = "",
    copy_col: str = "epoch_copy",
) -> DataFrame:
    """Deterministic training-mixture upsampling: emit each row of
    source ``s`` exactly ``floor(epochs[s])`` times, plus one more iff
    its hash falls below ``frac(epochs[s])`` of the space — so a
    source weighted 2.4 contributes every row twice and a
    deterministic 40% of rows a third time, and the realized token
    proportions converge to the published mixture weights (the
    Pile/Dolma/LLaMA "epochs over each source" recipe) without any
    RNG state.

    Sources absent from ``epochs`` are dropped (weight 0). Output rows
    gain ``copy_col`` (0-based copy index) so downstream shard
    writers / sequence packers can keep copies apart; the (identity,
    copy) pair is a stable global key for resume-safe export.

    Deterministic in (identity, salt) like every assignment in this
    module: the same doc gets the same copy count on any cluster
    layout, and the oracle can re-derive every copy from sha256.

    Scale shape: a when-chain over ``source_col`` + one sha2 + an
    explode of a ≤ceil(w)-element sequence — pure map-side projection,
    zero shuffle; output size is Σ_s |s|·epochs[s] by construction.
    """
    if any(w < 0 for w in epochs.values()):
        raise ValueError("epoch weights must be non-negative")
    h = det_hash(on, salt)
    src = F.col(source_col)
    full = F.lit(0)
    bound = F.lit(0)
    for name, w in epochs.items():
        full = F.when(src == F.lit(name), F.lit(int(w))).otherwise(full)
        bound = F.when(
            src == F.lit(name), F.lit(int((w - int(w)) * HASH_SPACE))
        ).otherwise(bound)
    copies = full + (h < bound).cast("int")
    return (
        df.withColumn("_n_copies", copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )
