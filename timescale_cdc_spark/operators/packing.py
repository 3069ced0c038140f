"""Sample packing — bin documents into fixed token-budget packs (the
sequence-packing step of an LLM pretraining data pipeline; companion
to operators/text.py token counting and operators/curation.py).

Distributed shape: optimal bin packing is NP-hard and even greedy
first-fit is inherently sequential, so packing is PER-PARTITION by
design — documents are hash-distributed across partitions, each
partition packs independently, and pack ids are globalized as
(partition_id, local_pack_id). Parallelism equals partition count and
no shuffle follows the initial distribution; the cost is bounded
slack (< one budget per partition), which is negligible when
partitions hold thousands of docs. This is the shape every
large-scale packing pipeline uses — a global greedy pass over 100 TB
would serialize on one task.

Two variants:
- ``assign_packs``: pure-JVM window cumsum — pack = floor(cumsum /
  budget). A pack may overflow by at most (max doc tokens - 1); zero
  Python, one sort per partition. The 100 TB default.
- ``assign_packs_exact``: per-partition greedy with reset via
  applyInPandas (Arrow-batched; sanctioned like SURVEY B40) — packs
  NEVER exceed the budget. Use when downstream concat is strict.

Docs longer than the budget go to their own single-doc pack in both
variants (truncation is the tokenizer's job, not the packer's).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType
from pyspark.sql.window import Window


def _with_partition(
    df: DataFrame,
    id_col: str,
    num_partitions: int,
    partition_expr: Column | None = None,
) -> DataFrame:
    # deterministic hash distribution: pack membership must be stable
    # across runs for reproducible training batches. partition_expr
    # overrides the xxhash64 default — e.g. sampling.det_hash for an
    # assignment re-derivable outside Spark (the oracle contract).
    part = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_partitions))
        if partition_expr is None
        else partition_expr
    )
    return df.withColumn("_part", part).repartition(
        num_partitions, "_part"
    )


def assign_packs(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    num_partitions: int = 32,
    partition_expr: Column | None = None,
) -> DataFrame:
    """Window-cumsum packing: adds ``pack_id`` (string
    ``<partition>-<local>``). Packs can overflow the budget by less
    than the largest packed doc; oversized docs get their own pack.

    ``partition_expr`` (round 10): optional deterministic partition
    assignment replacing the xxhash64 default — pass e.g.
    ``det_hash([id_col], salt) % num_partitions`` to make the whole
    pack assignment re-derivable in portable SQL (cumsum + floor are
    plain window arithmetic; only the hash was engine-specific)."""
    parted = _with_partition(df, id_col, num_partitions, partition_expr)
    w = (
        Window.partitionBy("_part")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fits = F.col(token_col) <= F.lit(budget)
    # cumsum over fitting docs only; oversized docs contribute 0 and
    # take a dedicated pack id keyed by their own doc id
    cum = F.sum(F.when(fits, F.col(token_col)).otherwise(F.lit(0))).over(w)
    local = F.floor((cum - F.col(token_col)) / F.lit(budget))
    return parted.withColumn(
        "pack_id",
        F.when(
            fits, F.concat_ws("-", F.col("_part"), local.cast("string"))
        ).otherwise(F.concat_ws("-", F.lit("solo"), F.col(id_col).cast("string"))),
    ).drop("_part")


def assign_packs_exact(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Greedy-with-reset packing via applyInPandas: every pack's token
    sum is <= budget (oversized docs solo). Arrow-batched, one Python
    pass per partition — the strict variant."""
    parted = _with_partition(df, id_col, num_partitions)
    # copy the field list before .add — StructType.add mutates in place
    out_schema = StructType(list(parted.drop("_part").schema.fields)).add(
        "pack_seq", LongType()
    )
    tok, idc = token_col, id_col

    def pack(pdf):
        pdf = pdf.sort_values(idc).reset_index(drop=True)
        part = int(pdf["_part"].iloc[0])
        seqs, seq, run = [], 0, 0
        for t in pdf[tok]:
            t = int(t)
            if t > budget or run + t > budget:
                seq, run = seq + 1, 0
            run += min(t, budget)
            seqs.append(seq)
            if t > budget:  # solo pack: next doc starts a fresh one
                seq, run = seq + 1, 0
        out = pdf.drop(columns=["_part"])
        # globalize: partition id in the high bits, local seq below
        out["pack_seq"] = [part * 10_000_000 + s for s in seqs]
        return out

    return parted.groupBy("_part").applyInPandas(pack, schema=out_schema)


def pack_sequences(
    packed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pack_col: str = "pack_id",
    sep: str = "<|eos|>",
    token_col: str | None = None,
) -> DataFrame:
    """Materialize the actual training sequences from an
    :func:`assign_packs` result: one row per pack with member docs
    concatenated in deterministic ``id_col`` order, joined by ``sep``
    (the EOS boundary the loader's attention mask splits on).
    Returns (pack_id, n_docs, packed_text[, n_tokens]).

    Deterministic by construction — collect_list order is
    normalized by array_sort over (id, text) structs before the
    join, so the emitted sequence is byte-reproducible (and
    oracle-checkable via ordered string_agg). One shuffle on
    ``pack_col``; sequence size is bounded by the pack budget, so
    rows stay small no matter the corpus size."""
    aggs = [
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(id_col, text_col))
                ),
                lambda s: s.getField(text_col),
            ),
            sep,
        ).alias("packed_text"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    return packed.groupBy(pack_col).agg(*aggs)
