"""Model-based document quality filtering (SURVEY.md §2 C4 adjunct):
the GPT-3 / CCNet / LLaMA "quality classifier" stage — a linear
classifier over sparse lexical features that separates a high-quality
reference corpus from raw crawl text. Brown et al. 2020 (GPT-3,
appendix A) trained logistic regression over hashed tf-idf features
with WebText as the positive class; CCNet and LLaMA use fastText
(Joulin et al. 2016) — the same model class, linear over sparse
bag-of-words. Spark-native shape: ``pyspark.ml`` Tokenizer →
HashingTF → IDF → LogisticRegression, so the fit is one MLlib job
and SCORING is a broadcastable model applied map-side — at 100 TB
the classifier pass is embarrassingly parallel, no shuffle.

The heuristic signals in :mod:`operators.text` (quality_score,
repetition_stats) are the Gopher-style RULE filters; this module is
the complementary LEARNED filter — the public recipes run both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: GPT-3's document-retention rule (Brown et al. 2020 appendix A):
#: keep a doc iff  score > 1 - X  with X ~ Pareto(alpha=9) — docs
#: scored low by the classifier still get in occasionally, preserving
#: tail diversity instead of a hard cutoff.
GPT3_PARETO_ALPHA = 9.0


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    max_iter: int = 20,
    reg_param: float = 1e-4,
):
    """Fit the tokenize→hash-tf→idf→logistic-regression pipeline on a
    (text, label∈{0,1}) frame; label 1 = high-quality/reference.
    Returns a fitted ``PipelineModel``. ``num_features`` is the
    feature-hashing width (2^18 ≈ GPT-3's sparse-feature scale for
    fixture corpora; production would raise it — collisions only
    soften the margin)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_words"),
            HashingTF(
                inputCol="_words",
                outputCol="_tf",
                numFeatures=num_features,
            ),
            IDF(inputCol="_tf", outputCol="_features"),
            LogisticRegression(
                featuresCol="_features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Apply a fitted classifier; returns the input plus
    ``quality_prob`` (P[label=1]) and ``quality_pred`` (0/1).
    Map-side only — the model broadcasts with the plan."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(docs)
    return out.select(
        *docs.columns,
        vector_to_array(F.col("probability"))[1].alias("quality_prob"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )


def pareto_keep(
    df: DataFrame,
    prob_col: str = "quality_prob",
    id_cols: list[str] | None = None,
    alpha: float = GPT3_PARETO_ALPHA,
    salt: str = "gpt3",
) -> DataFrame:
    """GPT-3's stochastic retention rule, made deterministic: keep a
    doc iff ``prob > 1 - X`` where X is a Pareto(alpha) draw — but
    the draw comes from the doc's own content hash (the
    :mod:`operators.sampling` ``det_hash`` trick), so the decision is
    reproducible and audit-able instead of run-dependent. Inverse
    CDF of numpy's Lomax-style pareto: X = (1-U)^(-1/alpha) - 1.
    Adds a boolean ``keep`` column."""
    from timescale_cdc_spark.operators.sampling import HASH_SPACE, det_hash

    id_cols = id_cols or ["doc_id"]
    u = det_hash(id_cols, salt) / F.lit(float(HASH_SPACE))
    x = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return df.withColumn("keep", F.col(prob_col) > (1.0 - x))
