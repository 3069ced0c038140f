"""Tier C queries (SURVEY.md §2 C1-C5): dedup / similarity / text /
multimodal over the documents+embeddings fixtures.

The fixture corpus has NO natural duplicates (500 distinct texts,
uniformly random unit vectors), so dedup/similarity queries plant
deterministic duplicates inside the query (union with perturbed
copies keyed off id arithmetic) — both the Spark side and the oracle
build the identical planted corpus, and the operator must find
exactly the planted structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescale_cdc_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from timescale_cdc_spark.operators.multimodal import attach_payload, extract_features
from timescale_cdc_spark.operators.similarity import (
    brute_force_topk,
    embedding_dup_pairs,
    hyperplane_lsh_topk,
)
from timescale_cdc_spark.operators.text import (
    LANG_PROFILES,
    fingerprint,
    language_scores,
    quality_score,
    token_stats,
)
from timescale_cdc_spark.queries.base import register, t

# Shared planted-corpus builders -------------------------------------------

PLANT_DOCS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    return docs.unionByName(copies)


PLANT_VECS_SQL = """
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0
"""


def _planted_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = (
        vecs.filter(F.col("vec_id") % 50 == 0)
        .withColumn("vec_id", F.col("vec_id") + 100000)
    )
    return vecs.unionByName(copies)


# --------------------------------------------------------------------------
# C1 exact dedup
# --------------------------------------------------------------------------


@register(
    "c1_dedup_exact",
    f"""
    WITH corpus AS ({PLANT_DOCS_SQL}),
    r AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT doc_id, length(text) AS n_chars FROM r WHERE rn = 1
    """,
)
def c1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 exact dedup: planted copies collapse back to the original
    (lowest doc_id) via content-hash keep-first (operators/dedup.py).
    One shuffle on sha2(text) — the 100 TB shape."""
    corpus = _planted_docs(spark, sf_dir)
    return exact_dedup(corpus, "text", "doc_id").select(
        "doc_id", F.length("text").alias("n_chars")
    )


@register(
    "c1_dedup_hash_groups",
    f"""
    WITH corpus AS ({PLANT_DOCS_SQL})
    SELECT sha256(text) AS content_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_id
    FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def c1_dedup_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 dup-group report: content-hash groups with >1 member — the
    audit view of exact dedup (sha2 ≙ DuckDB sha256, byte-equal hex)."""
    corpus = _planted_docs(spark, sf_dir)
    return (
        corpus.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
    )


# --------------------------------------------------------------------------
# C2 near-dup: n-gram Jaccard (oracle), MinHash-LSH + SimHash (rows-only)
# --------------------------------------------------------------------------


@register(
    "c2_ngram_jaccard",
    f"""
    WITH corpus AS ({PLANT_DOCS_SQL}),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
    sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', words[i], words[i+1], words[i+2]) AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) * 1000000) / 1000000 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    """,
)
def c2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 exact n-gram Jaccard near-dup pairs over the planted corpus:
    word-3-gram shingles, shingle-blocked candidates (never all-pairs),
    exact |∩|/|∪| ≥ 0.8 (operators/dedup.py::ngram_jaccard_pairs)."""
    corpus = _planted_docs(spark, sf_dir)
    return ngram_jaccard_pairs(corpus, "text", "doc_id", shingle_n=3, threshold=0.8)


@register("c2_minhash_lsh")  # xxhash64 signatures are Spark-specific → rows-only
def c2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 MinHash-LSH near-dup pairs (rows-only check; planted-pair
    recall is asserted in tests/test_operators.py). 64 hashes,
    16 bands × 4 — S-curve threshold ≈ 0.5."""
    corpus = _planted_docs(spark, sf_dir)
    return minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5)


@register("c2_simhash")  # xxhash64 fingerprints are Spark-specific → rows-only
def c2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 SimHash near-dup pairs (rows-only; recall in tests):
    64-bit fingerprints, 4×16-bit pigeonhole bands, hamming ≤ 3."""
    corpus = _planted_docs(spark, sf_dir)
    return simhash_pairs(corpus, "text", "doc_id", max_hamming=3)


# --------------------------------------------------------------------------
# C3 similarity search
# --------------------------------------------------------------------------


@register(
    "c3_topk_cosine",
    """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT q_id, c_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                   4) AS cos
      FROM q JOIN c ON c_id <> q_id
    ),
    ranked AS (
      SELECT q_id, c_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
      FROM scored
    )
    SELECT q_id, c_id, cos, rank FROM ranked WHERE rank <= 5
    """,
)
def c3_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 exact cosine top-K: 10 query vectors vs the corpus,
    broadcast-join + zip_with dot products + per-query rank window
    (operators/similarity.py::brute_force_topk). The exact baseline
    the LSH path is measured against."""
    em = t(spark, sf_dir, "embeddings")
    return brute_force_topk(em, em.filter(F.col("vec_id") < 10), k=5)


@register("c3_ann_lsh")  # LSH bucket recall is probabilistic → rows-only
def c3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 approximate top-K via random-hyperplane LSH: sketch → banded
    candidates → exact re-rank (recall vs brute force asserted in
    tests/test_operators.py). The 100 TB path — candidates per query
    are bucket-bounded, not |corpus|."""
    em = t(spark, sf_dir, "embeddings")
    return hyperplane_lsh_topk(em, em.filter(F.col("vec_id") < 10), k=5)


@register(
    "c3_embedding_dup_pairs",
    f"""
    WITH corpus AS ({PLANT_VECS_SQL}),
    a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus)
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           round(list_dot_product(x.v, y.v)
                 / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
                 4) AS cos
    FROM a x JOIN a y ON x.vec_id < y.vec_id
    WHERE round(list_dot_product(x.v, y.v)
                / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
                4) >= 0.99
    """,
)
def c3_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2 embedding-cosine near-dup: planted identical vectors must
    surface as cos≈1 pairs. Exact all-pairs form here (oracle-
    checkable); hyperplane LSH is the documented scale path."""
    corpus = _planted_vecs(spark, sf_dir)
    return embedding_dup_pairs(corpus, threshold=0.99)


# --------------------------------------------------------------------------
# C4 text analysis
# --------------------------------------------------------------------------

_MARKER_SQL = {
    lang: ", ".join(f"'{w}'" for w in words)
    for lang, words in sorted(LANG_PROFILES.items())
}

_LANG_SCORE_COLS = ",\n           ".join(
    f"floor(CAST(len(list_filter(string_split(lower(text), ' '), "
    f"w -> w IN ({_MARKER_SQL[lang]}))) AS DOUBLE)"
    f" / greatest(len(string_split(lower(text), ' ')), 1) * 1000000) / 1000000 AS score_{lang}"
    for lang in sorted(LANG_PROFILES)
)

_BEST = "greatest(" + ", ".join(f"score_{lang}" for lang in sorted(LANG_PROFILES)) + ")"
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN score_{lang} = {_BEST} THEN '{lang}'"
        for lang in sorted(LANG_PROFILES)
    )
    + " END"
)


@register(
    "c4_language_scores",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
           {_LANG_SCORE_COLS}
      FROM documents
    )
    SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
           {_PRED} AS predicted_lang
    FROM scored
    """,
)
def c4_language_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 language-ID: marker-word profile scoring with deterministic
    argmax (operators/text.py::language_scores). The fixture corpus is
    vocabulary-identical across langs (verified), so accuracy is
    asserted on real multilingual samples in tests/test_operators.py;
    this query pins the scoring machinery."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return language_scores(docs, "text").select(
        "doc_id",
        "lang",
        "score_de",
        "score_en",
        "score_es",
        "score_fr",
        "score_zh",
        "predicted_lang",
    )


@register(
    "c4_quality_score",
    """
    WITH m AS (
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
               AS n_punct,
             len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','a','of','and','to','in'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens,
           floor(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) * 1000000) / 1000000
             AS punct_ratio,
           floor(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) * 1000000) / 1000000
             AS stopword_ratio,
           floor(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / greatest(n_tokens, 1)
                 * 1000000) / 1000000 AS mean_word_len,
           floor((0.4 * least(n_tokens / 100.0, 1.0)
               + 0.3 * (CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1))
               + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1))
               + 0.1 * least((CAST(n_chars - (n_tokens - 1) AS DOUBLE)
                              / greatest(n_tokens, 1)) / 10.0, 1.0)) * 1000000)
             / 1000000 AS quality
    FROM m
    """,
)
def c4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 quality scoring: length/punct/stopword/word-length signals →
    bounded score (operators/text.py::quality_score)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(docs, "text").select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "mean_word_len", "quality",
    )


@register(
    "c4_token_stats",
    r"""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             AS bpe_tokens
    FROM documents
    """,
)
def c4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 token counting: whitespace tokens + BPE-ish pre-tokenizer
    regex (operators/text.py::token_stats)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return token_stats(docs, "text").select("doc_id", "ws_tokens", "bpe_tokens")


@register(
    "c4_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS content_fingerprint
    FROM documents
    """,
)
def c4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 document fingerprinting: md5 over normalized text — portable
    content identity (operators/text.py::fingerprint; the xxhash64
    companion column is Spark-specific, excluded from the oracle)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(docs, "text").select("doc_id", "content_fingerprint")


# --------------------------------------------------------------------------
# C5 multimodal columns
# --------------------------------------------------------------------------


@register(
    "c5_multimodal_meta",
    """
    SELECT doc_id AS media_id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           source
    FROM documents
    """,
)
def c5_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 multimodal storage layout: binary payload + typed metadata
    struct (operators/multimodal.py::attach_payload); the metadata
    side is queryable without touching payload bytes — the predicate-
    pruning property that matters at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    mm = attach_payload(docs, "doc_id", "text", "source")
    return mm.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


@register("c5_feature_extract")  # sha256-derived stub features → rows-only
def c5_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 feature extraction: mapInPandas over binary payloads with the
    deterministic decode stub (real decode gated behind
    NotImplementedError — no media libs in this container). Plumbing
    (schema, Arrow batching, partition parallelism) is fully real."""
    docs = t(spark, sf_dir, "documents")
    mm = attach_payload(docs, "doc_id", "text", "source")
    feats = extract_features(mm, fake=True)
    return feats.select(
        "media_id", "n_bytes", F.round(F.element_at("feature", 1), 6).alias("f0")
    )


@register("c3_ann_ivf")  # KMeans cells are engine-specific → rows-only
def c3_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 approximate top-K via IVF-Flat (operators/similarity.py::
    ivf_topk): KMeans coarse quantizer → probe 4/16 cells → exact
    re-rank. Recall vs brute force asserted in tests/test_operators.py.
    The inverted-list layout is the FAISS-style scale path alongside
    hyperplane LSH."""
    from timescale_cdc_spark.operators.similarity import ivf_topk

    em = t(spark, sf_dir, "embeddings")
    return ivf_topk(em, em.filter(F.col("vec_id") < 10), k=5)
