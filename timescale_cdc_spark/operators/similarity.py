"""Similarity search over embedding columns (SURVEY.md §2 C3).

- ``brute_force_topk``: exact cosine top-K — broadcast the (small)
  query set against the corpus; dot products via zip_with/aggregate
  (JVM codegen, no UDF). The baseline and the verifier for the
  approximate path.
- ``hyperplane_lsh_topk``: random-hyperplane LSH — sign sketch →
  banded hamming candidates → exact re-rank. The 100 TB path: the
  corpus is touched once to sketch (linear), candidates per query are
  bucket-bounded instead of |corpus|.
- ``embedding_dup_pairs``: threshold-cosine near-duplicate pairs
  (C1's embedding-space variant) — same candidate discipline.

Embeddings in the fixtures are unit-normalized (verified: ‖v‖²=1), so
cosine == dot product; a general deployment divides by norms, kept
here explicitly for correctness on non-normalized inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL text of _dot — the same cast-to-double left fold."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> F.Column:
    """JVM-expression cosine: sequential left-fold, bit-identical to
    the DuckDB oracle's list_dot_product — the correctness engine.

    Pass column NAMES (str) where possible: the whole expression then
    parses as one SQL string instead of constructing six Column
    lambdas over py4j (~0.1 s each at plan-build time, round 13).
    A plain string is always backtick-quoted as ONE column name —
    dots included, so a column literally named ``price.usd`` resolves
    correctly (ADVICE r13). For an alias-qualified reference, pass a
    pre-quoted string built by
    :func:`timescale_cdc_spark.functions.ident.sql_qualified`
    (detected by the leading backtick and spliced verbatim), or a
    Column."""
    if isinstance(a, str) and isinstance(b, str):
        from timescale_cdc_spark.functions.ident import sql_ident

        qa = a if a.startswith("`") else sql_ident(a)
        qb = b if b.startswith("`") else sql_ident(b)
        return F.expr(
            f"{_dot_sql(qa, qb)} / "
            f"(sqrt({_dot_sql(qa, qa)}) * sqrt({_dot_sql(qb, qb)}))"
        )
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_arrow(a, b) -> F.Column:
    """Arrow-vectorized cosine (numpy batch, SIMD): ~10-50× the
    throughput of the interpreted higher-order-function fold at
    million-vector scale (SCALE.md), at the cost of a different float
    summation ORDER than the sequential fold — use for ANN scoring
    (results round to 4 dp anyway), not for oracle-paired queries."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        A = np.stack(av.to_numpy()).astype(np.float64)
        B = np.stack(bv.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(dots / (na * nb))

    return _cos(a, b)


def _cosine_for(engine: str) -> "callable":
    if engine == "arrow":
        return cosine_arrow
    if engine == "jvm":
        return cosine
    raise ValueError(f"unknown scoring engine {engine!r}; use 'jvm' or 'arrow'")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    engine: str = "jvm",
) -> DataFrame:
    """Exact top-K: for each query vector, the K nearest corpus
    vectors by cosine (self-matches excluded). The query side is
    broadcast — at 100 TB the corpus scan stays a single
    embarrassingly-parallel pass. Ties break on corpus id for
    determinism. ``engine='arrow'`` swaps the scorer for the
    numpy-batched pandas UDF (see cosine_arrow) — the throughput path
    for million-vector sweeps."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    score = _cosine_for(engine)
    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        # names, not Columns: the jvm scorer then builds one parsed
        # SQL string (see cosine); pandas_udf accepts names too
        .withColumn("cos", F.round(score("q_vec", "c_vec"), round_digits))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def brute_force_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-K via one matrix multiply per Arrow batch — the
    million-vector throughput path.

    The pairwise scorers (JVM fold or cosine_arrow) materialize
    |corpus| × |queries| pair rows before scoring; at 1M × 10 that is
    10M rows of shuffled/transferred vector payload and the data
    movement, not the math, dominates (measured in SCALE.md). Here the
    corpus streams ONCE through mapInPandas: each Arrow batch is
    normalized and multiplied against the (broadcast, tiny) query
    matrix in a single BLAS call, and only each batch's per-query
    top-K survives — map-side top-K pushdown, so the final global
    rank window sees O(batches × queries × k) rows, not the corpus.

    Exact: the global top-K is a subset of the union of per-batch
    top-Ks (same (cos desc, c_id asc) order both levels). Scores are
    float64 matmul + round; summation order differs from the JVM fold,
    so agreement with `brute_force_topk` is to the rounding digit, not
    bitwise.
    """
    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = np.round(Mn @ Qn.T, round_digits)  # (n, n_queries)
            for qi, q_id in enumerate(q_ids):
                col = S[:, qi]
                mask = ids != q_id  # exclude self-match
                m_ids, m_cos = ids[mask], col[mask]
                # top-k by (cos desc, c_id asc); lexsort: last key primary
                order = np.lexsort((m_ids, -m_cos))[:k]
                yield pd.DataFrame(
                    {
                        "q_id": np.full(len(order), q_id, dtype=np.int64),
                        "c_id": m_ids[order],
                        "cos": m_cos[order],
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "q_id long, c_id long, cos double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).round(6).tolist()


def sketch_bits(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign sketch: bit j = 1 iff vec · plane_j > 0, packed as long.

    Built as ONE expr() string, not num_planes × dim nested Column
    objects — the py4j tree form cost ~2.5 s of fixed per-query
    construction overhead (see operators/dedup.py for the same
    pattern); the SQL text parses once on the JVM and evaluates the
    identical fold, so sketches are bit-identical."""

    from timescale_cdc_spark.functions.ident import sql_ident

    def dot_expr(plane: list[float]) -> str:
        arr = ", ".join(f"{float(v)!r}D" for v in plane)
        return (
            f"aggregate(zip_with({sql_ident(vec_col)}, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )

    terms = " | ".join(
        f"(CASE WHEN {dot_expr(plane)} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j, plane in enumerate(planes)
    )
    return F.expr(terms)


def proj_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """``array<double>`` of the vector's dot product with every
    hyperplane — the raw margins the sign sketch quantizes. Built as
    ONE expr() string (same rationale as sketch_bits). Exposing the
    margins (not just the signs) is what enables query-directed
    multi-probe: the bits most likely to be on the wrong side of the
    plane are exactly the lowest-|margin| ones."""
    from timescale_cdc_spark.functions.ident import sql_ident

    def dot_expr(plane: list[float]) -> str:
        arr = ", ".join(f"{float(v)!r}D" for v in plane)
        return (
            f"aggregate(zip_with({sql_ident(vec_col)}, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )

    return F.expr("array(" + ", ".join(dot_expr(p) for p in planes) + ")")


def _home_key(proj: str, c: int, width: int) -> str:
    """SQL for band c's bucket key from the margin array: pack the
    sign bits of planes [c*width, (c+1)*width)."""
    return (
        f"aggregate(zip_with(slice({proj}, {c * width + 1}, {width}), "
        f"sequence(0, {width - 1}), "
        "(p, j) -> IF(p > 0.0D, shiftleft(1L, j), 0L)), 0L, (a, b) -> a | b)"
    )


def _lsh_rerank(cb: DataFrame, qb: DataFrame, k: int) -> DataFrame:
    """Shared LSH tail: banded candidate join (query side broadcast),
    dedup, EXACT cosine re-rank, per-query top-K."""
    cand = (
        cb.join(
            F.broadcast(qb),
            (F.col("c_chunk") == F.col("q_chunk"))
            & (F.col("c_key") == F.col("q_key"))
            & (F.col("c_id") != F.col("q_id")),
        )
        .select("q_id", "q_vec", "c_id", "c_vec")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.withColumn(
        "cos", F.round(cosine("q_vec", "c_vec"), 4)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def _banded_arrow(
    df: DataFrame,
    side: str,
    planes: list[list[float]],
    chunks: int,
    width: int,
    id_col: str,
    vec_col: str,
    n_flip: int = 0,
) -> DataFrame:
    """Arrow/numpy variant of the sketch+banding pipeline: one matmul
    per Arrow batch against the plane matrix instead of num_planes
    interpreted higher-order folds per row. Same keys except for dot
    products within float-rounding of zero (summation-order
    sensitivity — the standard jvm/arrow trade documented on the
    scorers). ~10× on the corpus-side sketch at 1M vectors (SCALE.md).
    ``n_flip > 0`` additionally emits the margin-directed multi-probe
    keys (query side)."""
    P = np.asarray(planes, dtype=np.float64).T  # dim × planes

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = V @ P
            n = len(pdf)
            for c in range(chunks):
                block = proj[:, c * width:(c + 1) * width]
                bits = block > 0
                key = np.zeros(n, dtype=np.int64)
                for j in range(width):
                    key |= bits[:, j].astype(np.int64) << j
                out = {
                    f"{side}_id": pdf[id_col].to_numpy(),
                    f"{side}_vec": pdf[vec_col],
                    "chunk": np.full(n, c, dtype=np.int32),
                    "key": key,
                }
                yield pd.DataFrame(out)
                if n_flip:
                    flip_bits = np.argsort(np.abs(block), axis=1)[:, :n_flip]
                    for fj in range(n_flip):
                        yield pd.DataFrame(
                            {
                                f"{side}_id": pdf[id_col].to_numpy(),
                                f"{side}_vec": pdf[vec_col],
                                "chunk": np.full(n, c, dtype=np.int32),
                                "key": key ^ (1 << flip_bits[:, fj].astype(np.int64)),
                            }
                        )

    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen,
        f"{side}_id long, {side}_vec {vec_type}, chunk int, key long",
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 96,
    chunks: int = 16,
    dim: int = 64,
    seed: int = 42,
    n_flip: int = 2,
    sketch_engine: str = "jvm",
) -> DataFrame:
    """Approximate top-K: 96-bit hyperplane sketch banded into 16
    6-bit chunks; candidates share ≥1 probed bucket; exact cosine
    re-ranks the candidates only.

    Query-directed MULTI-PROBE (Lv et al., VLDB'07): besides its home
    bucket, each query probes, per band, the buckets reached by
    flipping each of its ``n_flip`` lowest-|margin| bits — the bits
    whose hyperplane the query sits closest to, i.e. the most likely
    single-bit disagreements with a true neighbor. This buys back the
    recall that banding alone loses without widening every bucket:
    probes per band = 1 + n_flip (vs 1 + width for blind hamming-1).
    Tuned empirically on the fixture distribution (near-random unit
    vectors — the hardest case for angular LSH): recall@5 ≥ 0.88 at
    sf0.001/sf0.01/sf0.1 across seeds, vs 0.36 for the old 16-bit
    4-band sketch at sf0.01.

    Only the (tiny, broadcast) query side pays the multi-probe
    explosion; the corpus is sketched once, linearly, into home
    buckets. Everything — margins, keys, flip selection — is JVM-side
    SQL expression, no Python in the hot path. Scale knob: width
    (bits/band) grows with corpus size to keep buckets small;
    n_flip/chunks grow recall.

    Recall is floor-tested against brute_force_topk at BOTH sf0.001
    and sf0.01 (tests/test_operators.py) and gated in-plan in the
    registered query (queries/llm_queries.py::c3_ann_lsh_ivf).

    ``sketch_engine='arrow'`` computes sketches as one numpy matmul
    per Arrow batch instead of num_planes interpreted JVM folds per
    row — the million-vector throughput path (same trade as the
    scorers: summation order differs, so a dot within float-rounding
    of zero can band differently; ranked output is exact either way
    because re-ranking is exact).
    """
    if num_planes % chunks:
        raise ValueError("num_planes must be divisible by chunks")
    planes = _hyperplanes(num_planes, dim, seed)
    width = num_planes // chunks
    if n_flip > width:
        raise ValueError("n_flip cannot exceed the band width")
    if sketch_engine not in ("jvm", "arrow"):
        raise ValueError(
            f"unknown sketch engine {sketch_engine!r}; use 'jvm' or 'arrow'"
        )
    if sketch_engine == "arrow":
        cb = _banded_arrow(
            corpus, "c", planes, chunks, width, id_col, vec_col
        ).withColumnsRenamed({"chunk": "c_chunk", "key": "c_key"})
        qb = _banded_arrow(
            queries, "q", planes, chunks, width, id_col, vec_col, n_flip
        ).withColumnsRenamed({"chunk": "q_chunk", "key": "q_key"})
        return _lsh_rerank(cb, qb, k)

    # Corpus side: home buckets only — one struct per band.
    corpus_bands = ", ".join(
        f"struct({c} AS chunk, {_home_key('_proj', c, width)} AS key)"
        for c in range(chunks)
    )
    cb = (
        corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            proj_expr(vec_col, planes).alias("_proj"),
        )
        .select(
            "c_id",
            "c_vec",
            F.explode(F.expr(f"array({corpus_bands})")).alias("ck"),
        )
        .select("c_id", "c_vec", "ck.chunk", "ck.key")
        .withColumnsRenamed({"chunk": "c_chunk", "key": "c_key"})
    )

    # Query side: home bucket + n_flip lowest-|margin| single-bit
    # flips per band. array_sort on (margin, bit) structs is
    # deterministic; `home ^ shiftleft(1, j)` is the flipped key.
    def probe_structs(c: int) -> str:
        home = _home_key("_proj", c, width)
        margins = (
            f"zip_with(slice(_proj, {c * width + 1}, {width}), "
            f"sequence(0, {width - 1}), (p, j) -> struct(abs(p) AS m, j AS j))"
        )
        flips = f"slice(transform(array_sort({margins}), s -> s.j), 1, {n_flip})"
        return (
            f"concat(array(struct({c} AS chunk, {home} AS key)), "
            f"transform({flips}, j -> struct({c} AS chunk, "
            f"({home} ^ shiftleft(1L, j)) AS key)))"
        )

    query_bands = ", ".join(probe_structs(c) for c in range(chunks))
    qb = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            proj_expr(vec_col, planes).alias("_proj"),
        )
        .select(
            "q_id",
            "q_vec",
            F.explode(F.expr(f"concat({query_bands})")).alias("ck"),
        )
        .select("q_id", "q_vec", "ck.chunk", "ck.key")
        .withColumnsRenamed({"chunk": "q_chunk", "key": "q_key"})
    )

    return _lsh_rerank(cb, qb, k)


def _estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of ``df``'s optimized plan —
    the same statistic broadcast-join planning divides against. Pure
    driver-side (one py4j call, no job). An unavailable estimate
    returns "huge" so the caller picks the scale-safe path."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - defensive py4j fallback
        return 1 << 62


#: embedding_dup_pairs switches from carrying the vector payload
#: through the banded self-join to id-only bands + attach-by-join
#: when the corpus' estimated bytes exceed this. Measured crossover
#: (round 16, SCALE.md): at sf0.1 (~1.3 MB est) payload-through wins
#: by ~0.4 s of fixed join setup; at 500k×64d (~256 MB raw) id-only
#: is 27% faster (32.3 vs 44.3 s min) and the gap grows with scale —
#: the banded exchange moves chunks× the corpus payload and the pair
#: dedup becomes a SortAggregate over vector pairs (arrays defeat
#: hash-agg). 64 MB sits safely between the regimes.
ATTACH_THRESHOLD_BYTES = 64 << 20


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 32,
    chunks: int = 4,
    dim: int = 64,
    seed: int = 42,
    carry_payload: bool | None = None,
    attach_threshold_bytes: int = ATTACH_THRESHOLD_BYTES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (C1/C2 embedding form):
    (a < b) pairs with cosine ≥ threshold, via hyperplane-LSH
    candidates + EXACT cosine verification.

    Candidate generation: every vector is sketched once (32 sign bits),
    banded into 4 × 8-bit chunks; only pairs sharing a chunk value are
    compared. The verify step is exact, so any surfaced pair is a true
    positive; a qualifying pair is missed only if it disagrees on ≥1
    bit in EVERY band — for cos ≥ 0.99 (θ ≈ 0.045π) the per-band match
    probability is (1-θ/π)^8 ≈ 0.66, so the miss probability is
    (1-0.66)^4 ≈ 1.3% per borderline pair and 0 for identical vectors
    (identical sketch). Raise ``chunks`` for higher recall, raise the
    per-band width for fewer candidates at larger corpora (candidates
    scale as chunks · Σ_buckets n_b²; width is the knob that keeps
    buckets small as n grows).

    Scale-adaptive payload routing (round 16, VERDICT r15 #6): on a
    small corpus the vectors ride through the banded self-join (two
    joins fewer — fixed setup dominates); past
    ``attach_threshold_bytes`` (Catalyst estimate, same statistic
    broadcast planning uses) the bands carry ids only, the candidate
    id-pair set is deduped while it is narrow (codegen hash-agg — id
    pairs, unlike vector pairs, hash-aggregate), and the vectors are
    attached afterwards with two hash joins against the corpus. Both
    paths are output-identical (exceptAll-pinned in
    tests/test_operators.py; measured identity at 500k vectors in
    SCALE.md); ``carry_payload`` forces a path explicitly.

    Either plan is a hash self-join on (chunk, key) — no
    CartesianProduct (pinned in tests/test_plans.py); the
    deterministic seeded hyperplanes make the result reproducible
    run-to-run. The exact all-pairs form is test-only
    (tests/test_operators.py compares this against it on the fixture
    corpus)."""
    planes = _hyperplanes(num_planes, dim, seed)
    width = num_planes // chunks
    if carry_payload is None:
        carry_payload = (
            _estimated_plan_bytes(df.select(id_col, vec_col))
            <= attach_threshold_bytes
        )
    payload = [F.col(vec_col).alias("_vec")] if carry_payload else []
    sk = df.select(
        F.col(id_col).alias("_id"),
        *payload,
        sketch_bits(vec_col, planes).alias("_fp"),
    )
    pcols = ["_vec"] if carry_payload else []
    banded = sk.select(
        "_id",
        *pcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("_fp"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("_id", *pcols, "ck.chunk", "ck.key")
    # shuffle_hash on both sides: identical shuffle exchanges instead
    # of a one-sided broadcast that recomputes the whole sketch
    # pipeline as a separate broadcast build (see
    # dedup.minhash_lsh_pairs for the measured effect).
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b").hint("shuffle_hash")
    joined = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a._id") < F.col("b._id")),
    )
    if carry_payload:
        cand = joined.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._vec").alias("va"),
            F.col("b._vec").alias("vb"),
        ).dropDuplicates(["id_a", "id_b"])
    else:
        pairs = joined.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        ).dropDuplicates(["id_a", "id_b"])
        va = df.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        ).hint("shuffle_hash")
        vb = df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        ).hint("shuffle_hash")
        cand = pairs.join(va, "id_a").join(vb, "id_b")
    return (
        cand.withColumn("cos", F.round(cosine("va", "vb"), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact form of ``embedding_dup_pairs`` — TEST-ONLY
    reference implementation (O(n²) comparisons; banned at scale by
    SURVEY §7 'never all-pairs'). Kept for recall verification of the
    LSH-bucketed operator above."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine("va", "vb"), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """C3 approximate top-K via IVF (inverted-file index): KMeans
    coarse quantizer partitions the corpus into cells; each query
    probes its ``n_probe`` nearest cells and exact-reranks only those
    candidates.

    Scale: the corpus is clustered once (KMeans is itself distributed);
    per query the scan touches ~n_probe/n_clusters of the corpus. The
    centroids live in a BROADCAST DataFrame and probe assignment is a
    broadcast join + rank window — plan size stays O(1) in cluster
    count (an unrolled-literal formulation grows the plan O(k·dim) and
    falls over around k≈4096 cells). This is the classic IVF-Flat
    layout (FAISS-style) in pure DataFrame ops — cluster assignment
    rides in a column, so the cell "inverted lists" are just a
    partitioning of the corpus table.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv"),
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="_cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("c_id", "c_vec", "_cell")

    # Centroids as a broadcast frame: O(n_clusters) rows, never
    # unrolled into the expression tree.
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(ci, [float(x) for x in np.asarray(c)]) for ci, c in
         enumerate(model.clusterCenters())],
        schema="_cell int, _centroid array<double>",
    )

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("_centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored_cells = q.crossJoin(F.broadcast(cent)).withColumn("_dist", l2)
    wp = Window.partitionBy("q_id").orderBy(F.asc("_dist"), F.asc("_cell"))
    probes = (
        scored_cells.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("q_id", "q_vec", "_cell")
    )

    cand = assigned.join(
        F.broadcast(probes),
        (assigned._cell == probes._cell) & (F.col("c_id") != F.col("q_id")),
    ).select("q_id", "q_vec", "c_id", "c_vec")
    scored = cand.withColumn(
        "cos", F.round(cosine("q_vec", "c_vec"), 4)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def _sq8_train_bounds(corpus: DataFrame, vec_col: str):
    """Per-dimension (min, scale) for linear int8 codes — one O(dim)
    collect (two numbers per dimension to the driver, never rows)."""
    stats = (
        corpus.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "_j", "_x"
            )
        )
        .groupBy("_j")
        .agg(F.min("_x").alias("_lo"), F.max("_x").alias("_hi"))
        .orderBy("_j")
        .collect()
    )
    vmins = [r["_lo"] for r in stats]
    # degenerate (constant) dimensions quantize to code 0 via scale 1
    scales = [((r["_hi"] - r["_lo"]) / 255.0) or 1.0 for r in stats]
    return vmins, scales


def _sq8_bounds_frame(spark, vmins, scales) -> DataFrame:
    """The bounds as a one-row broadcastable frame, so plan size stays
    O(1) in dimension (two array literals, not 2×dim scalar exprs)."""
    return spark.createDataFrame(
        [(vmins, scales)], "_vmin array<double>, _scale array<double>"
    )


def _sq8_encode(vec) -> F.Column:
    """vec → int8 codes under the ``_vmin``/``_scale`` bound columns."""
    return F.transform(
        vec,
        lambda x, j: F.least(
            F.greatest(
                F.round(
                    (x.cast("double") - F.element_at(F.col("_vmin"), j + 1))
                    / F.element_at(F.col("_scale"), j + 1)
                ),
                F.lit(0.0),
            ),
            F.lit(255.0),
        ).cast("int"),
    )


def _sq8_dequantize(code) -> F.Column:
    return F.transform(
        code,
        lambda c, j: F.element_at(F.col("_vmin"), j + 1)
        + c.cast("double") * F.element_at(F.col("_scale"), j + 1),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """C3 approximate top-K via 8-bit scalar quantization (FAISS's
    ``SQ8`` flat index — the other billion-scale compression
    workhorse next to PQ): per-dimension linear int8 codes trained
    from corpus min/max, a compressed-domain scan (dequantize + cosine
    on codes — 4× less I/O than float32), then exact re-rank of the
    approx top-``rerank`` against the ORIGINAL vectors fetched by id
    (the FAISS refine step — the wide float scan touches only
    |queries|·rerank rows, never the corpus).

    Scale shape: training is one O(dim) collect (per-dimension
    min/max); the bounds ride in a one-row broadcast frame so plan
    size stays O(1) in dimension; the code scan is one
    embarrassingly-parallel pass with broadcast queries, same as
    :func:`brute_force_topk` but over 1-byte-per-dim codes. This
    one-shot form re-trains bounds and re-encodes the corpus on
    EVERY call — for repeated query batches use :class:`Sq8Index`
    (round 11, VERDICT r10 #4), which encodes once at build and
    serves every batch from persisted codes."""
    spark = corpus.sparkSession
    vmins, scales = _sq8_train_bounds(corpus, vec_col)
    bounds = _sq8_bounds_frame(spark, vmins, scales)
    codes = corpus.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col).alias("c_id"),
        _sq8_encode(F.col(vec_col)).alias("_code"),
        "_vmin",
        "_scale",
    )
    raw = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    return _sq8_scan_refine(codes, raw, queries, k, rerank, id_col, vec_col)


def _sq8_scan_refine(
    codes: DataFrame,
    raw: DataFrame,
    queries: DataFrame,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared SQ8 query tail: compressed-domain cosine scan over
    ``codes`` (carrying ``_vmin``/``_scale``) with broadcast queries,
    then exact re-rank of the approx top-``rerank`` against ``raw``
    fetched by id (the FAISS refine step)."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    approx = codes.join(
        F.broadcast(q), F.col("c_id") != F.col("q_id")
    ).withColumn("_acos", cosine(F.col("q_vec"), _sq8_dequantize(F.col("_code"))))
    wa = Window.partitionBy("q_id").orderBy(F.desc("_acos"), F.asc("c_id"))
    cand = (
        approx.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= rerank)
        .select("q_id", "q_vec", "c_id")
    )
    refined = cand.join(raw, "c_id").withColumn(
        "cos", F.round(cosine("q_vec", "c_vec"), 4)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


class Sq8Index:
    """Build-once / query-many persisted SQ8 index (round 11, VERDICT
    r10 #4 — keeps :func:`sq8_topk`'s docstring promise): the
    PqIndex store pattern applied to scalar quantization. ``build``
    trains the per-dimension bounds ONCE (one O(dim) collect),
    encodes the corpus ONCE, and persists codes + raw vectors +
    bounds meta; every later ``topk`` batch reads the compressed
    codes straight off disk — no bounds re-collect, no corpus
    re-encode, and the wide float scan still touches only
    |queries|·rerank rows in the refine step.

    Storage: codes as ``array<int>`` of 0..255 values — parquet's
    dictionary/bit-pack encoding stores them near 1 byte/dim, and
    keeping them as plain ints lets the dequantize scan stay a pure
    codegen expression (no unpack step)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    @property
    def _codes_path(self) -> str:
        return f"{self.path}/codes"

    @property
    def _raw_path(self) -> str:
        return f"{self.path}/raw"

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/meta"

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "Sq8Index":
        vmins, scales = _sq8_train_bounds(corpus, vec_col)
        bounds = _sq8_bounds_frame(self.spark, vmins, scales)
        raw = corpus.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        )
        codes = corpus.crossJoin(F.broadcast(bounds)).select(
            F.col(id_col).alias("c_id"),
            _sq8_encode(F.col(vec_col)).alias("_code"),
        )
        codes.write.mode("overwrite").parquet(self._codes_path)
        raw.write.mode("overwrite").parquet(self._raw_path)
        meta = self.spark.createDataFrame(
            [(vmins, scales, len(vmins), raw.count())],
            "_vmin array<double>, _scale array<double>, "
            "dim int, n_at_build long",
        )
        meta.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        return self

    def codes(self) -> DataFrame:
        """LIVE code rows (tombstoned ids anti-joined out — zero
        overhead until the first :meth:`delete`)."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.filter_live(
            self.spark, self.path, self.spark.read.parquet(self._codes_path)
        )

    def raw(self) -> DataFrame:
        """LIVE raw rows (same tombstone filter as :meth:`codes`)."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.filter_live(
            self.spark, self.path, self.spark.read.parquet(self._raw_path)
        )

    def meta(self) -> dict:
        return self.spark.read.parquet(self._meta_path).first().asDict()

    # -- maintenance (round 12, VERDICT r11 #4: the ann_index.IvfIndex
    # append/staleness contract for the SQ8 family) ---------------------------

    def delete(self, ids, id_col: str = "vec_id") -> int:
        """Tombstone deletions (round 14, VERDICT r13 #4): effective
        immediately — :meth:`codes` and :meth:`raw` both anti-join
        the tombstone set, so a deleted id leaves the compressed
        shortlist AND the exact refine at once (no half-deleted state
        is observable). Bytes reclaimed by :meth:`compact`. Returns
        newly recorded ids."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.add_tombstones(self.spark, self.path, ids, id_col)

    def compact(self) -> int:
        """Physically purge tombstoned rows from codes AND raw behind
        atomic two-rename swaps, clearing the tombstones LAST (a
        crash between the two rewrites leaves the tombstones in
        place, so reads stay filtered and consistent; the next
        compact finishes). Returns live corpus rows."""
        import os

        from timescale_cdc_spark.operators import tombstones as tb

        if not os.path.isdir(self._raw_path):
            return 0
        tb.recover_swap(self._codes_path)
        tb.recover_swap(self._raw_path)
        live_raw = self.raw()
        n = live_raw.count()
        tb.swap_rewrite(self.spark, self._codes_path, self.codes())
        tb.swap_rewrite(self.spark, self._raw_path, live_raw)
        tb.clear_tombstones(self.spark, self.path)
        return n

    def append(
        self,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Absorb inserts WITHOUT retraining the bounds: encode with
        the FROZEN per-dimension grid (out-of-range coordinates CLAMP
        to the grid edge — ``_sq8_encode``'s least/greatest; the
        z-order stale-bounds contract) and append codes + raw. An
        insert batch is one map-side encode + two appends, never a
        corpus rewrite. Correctness is unaffected — the exact refine
        reads raw vectors — only the compressed scan's ranking
        sharpness decays as appends clamp; :meth:`staleness` is the
        rebuild trigger. Caller contract: ids are new (the CDC upsert
        path dedupes upstream).

        Crash-window discipline (round 12): the two appends are not
        atomic, so RAW commits FIRST. A crash between them leaves
        raw-without-codes — the batch's vectors are merely invisible
        to the compressed shortlist (a bounded recall gap, detectable
        as a codes/raw row-count mismatch) and :meth:`repair`
        re-encodes them. The reverse order would leave
        codes-without-raw: shortlisted ids the exact-refine join
        silently DROPS from every topk — an invisible wrong-answer
        state no sweep can see from the query path."""
        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        raw = new_vectors.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        )
        codes = new_vectors.crossJoin(F.broadcast(bounds)).select(
            F.col(id_col).alias("c_id"),
            _sq8_encode(F.col(vec_col)).alias("_code"),
        )
        raw.write.mode("append").parquet(self._raw_path)
        codes.write.mode("append").parquet(self._codes_path)
        self.spark.catalog.refreshByPath(self._codes_path)
        self.spark.catalog.refreshByPath(self._raw_path)

    def repair(self) -> int:
        """Recover an interrupted :meth:`append`: encode and append
        codes for raw ids that have none (one anti-join over the
        corpus — maintenance cadence, same as :meth:`staleness`).
        Returns the number of rows repaired."""
        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        # localCheckpoint (not persist): the append WRITES to the same
        # codes path the anti-join READS. A persisted cache is
        # best-effort — an evicted block would recompute mid-append,
        # re-read the half-appended dir, and silently under-write
        # (ADVICE r12). The checkpoint severs the lineage for real.
        missing = (
            self.raw()
            .join(self.codes().select("c_id"), "c_id", "left_anti")
            .crossJoin(F.broadcast(bounds))
            .select("c_id", _sq8_encode(F.col("c_vec")).alias("_code"))
            .localCheckpoint()
        )
        n = missing.count()
        if n:
            missing.write.mode("append").parquet(self._codes_path)
            self.spark.catalog.refreshByPath(self._codes_path)
        # release the checkpointed blocks once the append has
        # committed — repeated repair() calls would otherwise
        # accumulate them until GC (ADVICE r13)
        missing.unpersist()
        return n

    def staleness(self) -> dict:
        """Rebuild signal: ``appended_fraction`` (share of the corpus
        added since build — appends use frozen bounds) and
        ``clamp_fraction`` (rows with ≥1 coordinate outside the frozen
        grid — pure drift signal: build rows never clamp because the
        bounds ARE their min/max, so every clamped row is an appended
        outlier whose compressed ranking is degraded).
        ``rebuild_recommended`` once appended_fraction > 0.25 or
        clamp_fraction > 0.10. One corpus scan — run on the
        maintenance cadence, not per query.

        Round 14 (VERDICT r13 #4): plus ``deleted_fraction`` (the
        tombstoned share of stored rows; ``compact_recommended`` at
        > 0.10). ``n_now``/``appended_fraction`` count LIVE rows —
        the raw difference is clamped at 0 when deletes of build-time
        rows push it negative."""
        from timescale_cdc_spark.operators import tombstones as tb

        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        oob = F.exists(
            F.transform(
                F.col("c_vec").cast("array<double>"),
                lambda x, j: (x < F.element_at(F.col("_vmin"), j + 1))
                | (
                    x
                    > F.element_at(F.col("_vmin"), j + 1)
                    + F.lit(255.0) * F.element_at(F.col("_scale"), j + 1)
                ),
            ),
            lambda b: b,
        )
        cur = (
            self.raw()
            .crossJoin(F.broadcast(bounds))
            .agg(
                F.count("*").alias("n_now"),
                F.avg(oob.cast("double")).alias("clamp_fraction"),
            )
            .collect()[0]
        )
        n_now = cur["n_now"] or 0
        appended_fraction = (
            max(0.0, (n_now - info["n_at_build"]) / n_now)
            if n_now
            else 0.0
        )
        clamp_fraction = float(cur["clamp_fraction"] or 0.0)
        n_dead = tb.count_tombstones(self.spark, self.path)
        deleted_fraction = (
            n_dead / (n_now + n_dead) if n_dead else 0.0
        )
        return {
            "n_at_build": info["n_at_build"],
            "n_now": n_now,
            "appended_fraction": appended_fraction,
            "clamp_fraction": clamp_fraction,
            "deleted_fraction": deleted_fraction,
            "compact_recommended": bool(deleted_fraction > 0.10),
            "rebuild_recommended": bool(
                appended_fraction > 0.25 or clamp_fraction > 0.10
            ),
        }

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        rerank: int = 50,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Same (q_id, c_id, cos, rank) surface as :func:`sq8_topk`,
        served from the persisted codes: one bounds read (a single
        meta row to the driver), the compressed scan, the exact
        refine by id."""
        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        codes = self.codes().crossJoin(F.broadcast(bounds))
        return _sq8_scan_refine(
            codes, self.raw(), queries, k, rerank, id_col, vec_col
        )


class IvfSq8Index:
    """IVF + SQ8 with residual encoding (round 11 — FAISS's
    ``IndexIVFScalarQuantizer``, the ``"IVF<n>,SQ8"`` factory string):
    a coarse KMeans quantizer routes each vector to a cell and SQ8
    encodes the RESIDUAL (vector − cell centroid) at int8 per
    dimension. The two reductions multiply exactly like IVF-PQ's: a
    query batch reads ``n_probe / n_cells`` of a corpus that is
    already 4× compressed, and residual encoding concentrates the
    int8 range on within-cell offsets (residual spans are far tighter
    than raw coordinate spans, so the 255-step grid is finer where it
    matters).

    Storage (the IvfPqIndex cell layout, SQ8 bounds instead of
    codebooks):
        <path>/centroids/          (_cell int, _centroid array<double>)
        <path>/codes/_cell=<c>/    (c_id long, _code array<int>)
        <path>/raw/_cell=<c>/      (c_id long, c_vec)
        <path>/meta/               (n_cells, dim, _vmin, _scale, n)

    Query: probe the ``n_probe`` nearest cells (broadcast-centroid
    join — plan size O(1) in cell count), collect the probed cell ids
    as literals so the codes scan is PARTITION-PRUNED, reconstruct
    candidates as centroid + dequantized residual (pure codegen),
    cosine-rank, exact-refine the shortlist against raw vectors read
    with the same pruning."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    @property
    def _centroids_path(self) -> str:
        return f"{self.path}/centroids"

    @property
    def _codes_path(self) -> str:
        return f"{self.path}/codes"

    @property
    def _raw_path(self) -> str:
        return f"{self.path}/raw"

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/meta"

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 16,
        seed: int = 42,
        sample_fraction: float | None = None,
    ) -> "IvfSq8Index":
        import numpy as np
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
        vecs = corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias(
                "_fv"
            ),
        )
        fit_base = (
            vecs.sample(fraction=sample_fraction, seed=seed)
            if sample_fraction
            else vecs
        )
        coarse = KMeans(
            k=n_cells, seed=seed, featuresCol="_fv", predictionCol="_cell"
        ).fit(fit_base)
        cent = self.spark.createDataFrame(
            [
                (ci, [float(x) for x in np.asarray(c)])
                for ci, c in enumerate(coarse.clusterCenters())
            ],
            schema="_cell int, _centroid array<double>",
        )
        cent.coalesce(1).write.mode("overwrite").parquet(
            self._centroids_path
        )

        assigned = coarse.transform(vecs).select("c_id", "c_vec", "_cell")
        residual = F.zip_with(
            F.col("c_vec"),
            F.col("_centroid"),
            lambda a, b: a.cast("double") - b,
        )
        with_res = assigned.join(F.broadcast(cent), "_cell").select(
            "c_id", "_cell", residual.alias("_res")
        )
        # SQ8 bounds over RESIDUALS — one O(dim) collect, like Sq8Index
        vmins, scales = _sq8_train_bounds(with_res, "_res")
        bounds = _sq8_bounds_frame(self.spark, vmins, scales)
        codes = with_res.crossJoin(F.broadcast(bounds)).select(
            "c_id", "_cell", _sq8_encode(F.col("_res")).alias("_code")
        )
        codes.write.mode("overwrite").partitionBy("_cell").parquet(
            self._codes_path
        )
        assigned.write.mode("overwrite").partitionBy("_cell").parquet(
            self._raw_path
        )
        # build-time stats for the staleness signal (round 12): corpus
        # size and mean coarse quantization error (mean residual L2²)
        build_stats = with_res.agg(
            F.count("*").alias("n"),
            F.avg(
                F.aggregate(
                    F.col("_res"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("qerr"),
        ).collect()[0]
        meta = self.spark.createDataFrame(
            [(
                n_cells, dim, vmins, scales,
                build_stats["n"], float(build_stats["qerr"] or 0.0),
            )],
            "n_cells int, dim int, _vmin array<double>, "
            "_scale array<double>, n_at_build long, "
            "qerr_at_build double",
        )
        meta.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        return self

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._centroids_path)

    def codes(self) -> DataFrame:
        """LIVE code rows (tombstoned ids anti-joined out — zero
        overhead until the first :meth:`delete`). The ``_cell``
        partition filter still prunes: Catalyst pushes it through the
        anti-join to the scan."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.filter_live(
            self.spark, self.path, self.spark.read.parquet(self._codes_path)
        )

    def raw(self) -> DataFrame:
        """LIVE raw rows (same tombstone filter as :meth:`codes`)."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.filter_live(
            self.spark, self.path, self.spark.read.parquet(self._raw_path)
        )

    def meta(self) -> dict:
        return self.spark.read.parquet(self._meta_path).first().asDict()

    def delete(self, ids, id_col: str = "vec_id") -> int:
        """Tombstone deletions (round 14, VERDICT r13 #4): effective
        immediately — :meth:`codes` and :meth:`raw` both anti-join
        the tombstone set, so a deleted id leaves the pruned
        compressed shortlist AND the exact refine at once. Bytes
        reclaimed by :meth:`compact`. Returns newly recorded ids."""
        from timescale_cdc_spark.operators import tombstones as tb

        return tb.add_tombstones(self.spark, self.path, ids, id_col)

    def compact(self) -> int:
        """Physically purge tombstoned rows from codes AND raw behind
        atomic two-rename swaps (cell partitioning preserved — probes
        keep pruning), clearing the tombstones LAST: a crash between
        the rewrites leaves the tombstones in place, so reads stay
        filtered and consistent, and the next compact finishes. Also
        folds each cell's accumulated append-batch files back together
        (``repartition("_cell")`` before the partitioned write).
        Returns live corpus rows."""
        import os

        from timescale_cdc_spark.operators import tombstones as tb

        if not os.path.isdir(self._raw_path):
            return 0
        tb.recover_swap(self._codes_path)
        tb.recover_swap(self._raw_path)
        live_raw = self.raw()
        n = live_raw.count()
        tb.swap_rewrite(
            self.spark,
            self._codes_path,
            self.codes().repartition("_cell"),
            ("_cell",),
        )
        tb.swap_rewrite(
            self.spark,
            self._raw_path,
            live_raw.repartition("_cell"),
            ("_cell",),
        )
        tb.clear_tombstones(self.spark, self.path)
        return n

    @staticmethod
    def _res_l2_sq() -> F.Column:
        """Squared L2 of (c_vec − _centroid) — the coarse quantization
        error of a row joined with its cell centroid."""
        return F.aggregate(
            F.zip_with(
                F.col("c_vec"),
                F.col("_centroid"),
                lambda a, b: (a.cast("double") - b)
                * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # -- maintenance (round 12, VERDICT r11 #4) -------------------------------

    def append(
        self,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Absorb inserts WITHOUT refitting coarse quantizer or
        bounds: assign each vector to its nearest FROZEN centroid
        (broadcast join + per-vector rank — the rule
        ``model.transform`` applied at build), encode the residual
        with the FROZEN grid (out-of-range clamps), and append into
        that cell's codes/raw partition directories — one broadcast
        join + two partition-local appends, never a corpus rewrite.
        Recall decays only as the distribution drifts off the frozen
        centroids/bounds; :meth:`staleness` is the rebuild trigger.
        Caller contract: ids are new (CDC upsert dedupes upstream).

        Crash-window discipline (round 12, same as
        :meth:`Sq8Index.append`): raw commits FIRST so an interrupted
        append leaves only shortlist-invisible raw rows (recoverable
        via :meth:`repair`), never codes whose refine join silently
        drops shortlisted results."""
        info = self.meta()
        cent = self.centroids()
        v = new_vectors.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        )
        # argmin via PARTIAL AGGREGATION, not a window: the scored
        # crossJoin is |batch|×n_cells rows carrying the full vector —
        # a window would shuffle+sort all of them (measured 156 s for
        # a 100k batch at 256 cells); min(struct(_dist, _cell)) map-
        # side-combines each id down to one tiny row before the
        # exchange (same deterministic tie-break: lowest cell wins).
        scored = v.crossJoin(F.broadcast(cent)).withColumn(
            "_dist", self._res_l2_sq()
        )
        best = (
            scored.groupBy("c_id")
            .agg(F.min(F.struct("_dist", "_cell")).alias("_b"))
            .select("c_id", F.col("_b._cell").alias("_cell"))
        )
        assigned = v.join(best, "c_id").join(F.broadcast(cent), "_cell")
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        residual = F.zip_with(
            F.col("c_vec"),
            F.col("_centroid"),
            lambda a, b: a.cast("double") - b,
        )
        # one exchange on _cell before the partitioned writes: without
        # it every task appends a file per touched cell (tasks ×
        # n_cells small files per append batch)
        enc = (
            assigned.withColumn("_res", residual)
            .crossJoin(F.broadcast(bounds))
            .select(
                "c_id", "c_vec", "_cell",
                _sq8_encode(F.col("_res")).alias("_code"),
            )
            .repartition("_cell")
            .persist()
        )
        enc.select("c_id", "c_vec", "_cell").write.mode(
            "append"
        ).partitionBy("_cell").parquet(self._raw_path)
        enc.select("c_id", "_cell", "_code").write.mode(
            "append"
        ).partitionBy("_cell").parquet(self._codes_path)
        enc.unpersist()
        self.spark.catalog.refreshByPath(self._codes_path)
        self.spark.catalog.refreshByPath(self._raw_path)

    def repair(self) -> int:
        """Recover an interrupted :meth:`append`: re-encode residuals
        for raw ids with no codes row (raw stores the assigned cell,
        so no re-assignment is needed — one anti-join + the frozen-grid
        encode, appended into the missing cells' partitions). Returns
        the number of rows repaired."""
        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        residual = F.zip_with(
            F.col("c_vec"),
            F.col("_centroid"),
            lambda a, b: a.cast("double") - b,
        )
        # localCheckpoint, not persist — severs the read-write cycle on
        # _codes_path for real (see Sq8Index.repair / ADVICE r12)
        missing = (
            self.raw()
            .join(self.codes().select("c_id"), "c_id", "left_anti")
            .join(F.broadcast(self.centroids()), "_cell")
            .withColumn("_res", residual)
            .crossJoin(F.broadcast(bounds))
            .select("c_id", "_cell", _sq8_encode(F.col("_res")).alias("_code"))
            .repartition("_cell")
            .localCheckpoint()
        )
        n = missing.count()
        if n:
            missing.write.mode("append").partitionBy("_cell").parquet(
                self._codes_path
            )
            self.spark.catalog.refreshByPath(self._codes_path)
        # release the checkpointed blocks once the append committed
        # (ADVICE r13 — same rationale as Sq8Index.repair)
        missing.unpersist()
        return n

    def staleness(self) -> dict:
        """The IvfIndex rebuild-signal contract: appended_fraction
        (appends use frozen centroids+bounds), qerr_ratio (current
        mean residual L2² over the build-time mean — distribution
        drift even at low append volume), cell_imbalance (max/mean
        cell size — a hot cell degrades probe cost), and
        rebuild_recommended (appended_fraction > 0.25 or qerr_ratio >
        1.5). One corpus scan + one agg; maintenance-cadence cheap.

        Round 14 (VERDICT r13 #4): plus ``deleted_fraction`` — the
        tombstoned share of stored rows (dead bytes probes still scan
        past until :meth:`compact`); ``compact_recommended`` flips at
        > 0.10. ``n_now``/``appended_fraction`` count LIVE rows, so
        deletes of build-time rows can push the raw difference
        negative — clamped at 0 (the deleted fraction carries that
        signal)."""
        from timescale_cdc_spark.operators import tombstones as tb

        info = self.meta()
        cur = (
            self.raw()
            .join(F.broadcast(self.centroids()), "_cell")
            .groupBy("_cell")
            .agg(
                F.count("*").alias("n"),
                F.sum(self._res_l2_sq()).alias("qerr_sum"),
            )
            .agg(
                F.sum("n").alias("n_now"),
                (F.sum("qerr_sum") / F.sum("n")).alias("qerr_now"),
                (F.max("n") / F.avg("n")).alias("cell_imbalance"),
            )
            .collect()[0]
        )
        # empty live corpus (all ids deleted) → NULL aggregates; keep
        # every ratio defined (same hardening as IvfIndex.staleness)
        n_now = cur["n_now"] or 0
        appended_fraction = (
            max(0.0, (n_now - info["n_at_build"]) / n_now)
            if n_now
            else 0.0
        )
        qerr_ratio = (
            cur["qerr_now"] / info["qerr_at_build"]
            if info.get("qerr_at_build") and cur["qerr_now"] is not None
            else 1.0
        )
        n_dead = tb.count_tombstones(self.spark, self.path)
        deleted_fraction = (
            n_dead / (n_now + n_dead) if n_dead else 0.0
        )
        return {
            "n_at_build": info["n_at_build"],
            "n_now": n_now,
            "appended_fraction": appended_fraction,
            "qerr_ratio": qerr_ratio,
            "cell_imbalance": cur["cell_imbalance"],
            "deleted_fraction": deleted_fraction,
            "compact_recommended": bool(deleted_fraction > 0.10),
            "rebuild_recommended": bool(
                appended_fraction > 0.25 or qerr_ratio > 1.5
            ),
        }

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        rerank: int = 50,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        info = self.meta()
        bounds = _sq8_bounds_frame(
            self.spark, list(info["_vmin"]), list(info["_scale"])
        )
        q = queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        cell_l2 = F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("_centroid"),
                lambda a, b: (a.cast("double") - b)
                * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored_cells = q.crossJoin(
            F.broadcast(self.centroids())
        ).withColumn("_cdist", cell_l2)
        wp = Window.partitionBy("q_id").orderBy(
            F.asc("_cdist"), F.asc("_cell")
        )
        probes = (
            scored_cells.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= n_probe)
            .select("q_id", "q_vec", "_cell")
        )
        # partition pruning needs literal cell values at planning time
        cells = sorted(
            r["_cell"] for r in probes.select("_cell").distinct().collect()
        )
        cent = self.centroids().withColumnRenamed("_centroid", "_cc")
        pruned = (
            self.codes()
            .filter(F.col("_cell").isin(cells))
            .join(F.broadcast(cent), "_cell")
            .crossJoin(F.broadcast(bounds))
        )
        # reconstruct = centroid + dequantized residual (pure codegen)
        recon = F.zip_with(
            F.col("_cc"), _sq8_dequantize(F.col("_code")),
            lambda a, b: a + b,
        )
        cand = (
            pruned.join(F.broadcast(probes), "_cell")
            .filter(F.col("c_id") != F.col("q_id"))
            .withColumn("_acos", cosine(F.col("q_vec"), recon))
        )
        wa = Window.partitionBy("q_id").orderBy(
            F.desc("_acos"), F.asc("c_id")
        )
        shortlist = (
            cand.withColumn("_ar", F.row_number().over(wa))
            .filter(F.col("_ar") <= max(rerank, k))
            .select("q_id", "q_vec", "c_id")
        )
        raw_pruned = self.raw().filter(F.col("_cell").isin(cells)).select(
            "c_id", "c_vec"
        )
        refined = shortlist.join(raw_pruned, "c_id").withColumn(
            "cos", F.round(cosine("q_vec", "c_vec"), 4)
        )
        w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
        return (
            refined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cos", "rank")
        )
