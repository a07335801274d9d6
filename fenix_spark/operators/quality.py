"""Classifier-based document quality scoring — the GPT-3 / LLaMA
curation pattern: train a linear classifier to separate a trusted
corpus (positive) from raw crawl (negative), score every raw document,
and keep the high scorers, optionally with Pareto-smoothed sampling so
the kept set isn't a hard threshold cliff (Brown et al. 2020, §A).

This is the discriminative sibling of DSIR (operators/dsir.py): same
hashed-ngram features, but a learned decision boundary instead of a
likelihood ratio. Both exist because they fail differently — the
classifier can exploit feature interactions; DSIR is calibration-free
and needs no optimizer.

Spark shape:

- Features are hashed n-gram counts (`HashingTF` over the same
  ``gram_occurrences`` stream DSIR uses) — scan-local, sparse vectors
  of fixed dim, no vocabulary state to coordinate.
- Training is `pyspark.ml` LogisticRegression: distributed L-BFGS over
  the feature frame; the model is a single dense coefficient vector
  (num_features + 1 doubles) that broadcasts to scoring.
- Scoring is one `model.transform` map pass (JVM-side BLAS dot) —
  no shuffle at all; the output is the positive-class probability.
- The Pareto keep rule is a pure row function of (score, hash60(id)):
  deterministic under retries/repartitioning like every sampling
  decision in this repo (operators/sampling.py contract).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60
from fenix_spark.operators.dsir import gram_occurrences

DEFAULT_FEATURES = 1 << 18


@dataclass(frozen=True)
class QualityModel:
    model: object  # pyspark.ml LogisticRegressionModel
    num_features: int
    max_ngram: int


def _featurize(
    df: DataFrame, text_col: str, id_col: str, num_features: int, max_ngram: int
) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    from fenix_spark.operators.dedup import spread

    grams = spread(df).select(
        F.col(id_col).alias("id"),
        # null text → empty gram list (HashingTF NPEs on a null array;
        # a null-text crawl row must score ~neutral, not kill the job)
        gram_occurrences(
            F.coalesce(F.col(text_col), F.lit("")), max_ngram
        ).alias("grams"),
    )
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=num_features
    )
    return tf.transform(grams)


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str,
    id_col: str,
    num_features: int = DEFAULT_FEATURES,
    max_ngram: int = 2,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> QualityModel:
    """Fit LR on positive (trusted) vs negative (raw) documents.
    Class balance is the caller's concern — sample the larger side
    first (`deterministic_sample`) if the corpora are lopsided."""
    from pyspark.ml.classification import LogisticRegression

    pos = _featurize(positive, text_col, id_col, num_features, max_ngram)
    neg = _featurize(negative, text_col, id_col, num_features, max_ngram)
    train = pos.select("features", F.lit(1.0).alias("label")).unionByName(
        neg.select("features", F.lit(0.0).alias("label"))
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        elasticNetParam=0.0,
        maxIter=max_iter,
        standardization=False,
    )
    return QualityModel(lr.fit(train), num_features, max_ngram)


def quality_scores(
    df: DataFrame, text_col: str, id_col: str, qm: QualityModel
) -> DataFrame:
    """(id, quality) — positive-class probability per document. One
    map pass: featurize + broadcast-coefficient dot product; join the
    result back on id for the payload."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(df, text_col, id_col, qm.num_features, qm.max_ngram)
    scored = qm.model.transform(feats)
    return scored.select(
        "id",
        F.element_at(vector_to_array("probability"), 2).alias("quality"),
    )


def pareto_keep(
    quality: Column, id_col: Column, alpha: float = 9.0, salt: str = ""
) -> Column:
    """GPT-3's smoothed keep rule: keep iff
    ``quality > 1 − pareto(alpha)`` with the Pareto draw derived from
    ``hash60(id ‖ salt)`` instead of an RNG — Lomax inverse-CDF
    ``x = (1−u)^(−1/α) − 1``. High-quality docs are kept almost
    surely; low-quality docs survive with small probability, so the
    kept corpus keeps diversity below the threshold cliff. Pure row
    expression: deterministic, scan-local, engine-portable."""
    u = (
        hash60(F.concat(id_col.cast("string"), F.lit(salt))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return quality > (F.lit(1.0) - pareto)


def quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    qm: QualityModel,
    alpha: float = 9.0,
    salt: str = "",
) -> DataFrame:
    """The kept documents (original columns + ``quality``), Pareto
    rule applied. Join is on id (broadcast-sized score frames get
    broadcast automatically by AQE; at full scale the join is
    id-partitioned either way)."""
    scores = quality_scores(df, text_col, id_col, qm)
    kept = scores.where(pareto_keep(F.col("quality"), F.col("id"), alpha, salt))
    return df.join(kept.withColumnRenamed("id", id_col), id_col)
