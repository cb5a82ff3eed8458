"""Learned quality classifier — fastText-style linear model over hashed
bag-of-words, trained and applied distributed with ``pyspark.ml``.

The heuristic :func:`functions.text.quality_score` gives cheap signals;
real pipelines (CCNet, fastText quality filters, FineWeb-Edu) LEARN the
filter: weak-label a seed set, train a linear classifier on hashed
token features, score the whole corpus in one pass. Spark-first that
is literally the MLlib pipeline — ``Tokenizer -> HashingTF ->
LogisticRegression`` — which keeps training as distributed aggregations
(L-BFGS over treeAggregate gradients) and scoring as one broadcast of
the weight vector into a JVM-side transform: no Python in either path.

Weak labels here come from the repo's own heuristic (stopword density
x distinct-token ratio terciles) so the whole loop runs on any corpus
with zero hand labels — swap in human labels by passing your own
``label`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weak_quality_labels(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Top/bottom terciles of a composite heuristic as weak 1/0 labels
    (middle tercile unlabeled, per the usual weak-supervision recipe).
    Returns (id, text, label) for the labeled subset."""
    from graphouse_spark.functions.text import quality_score

    feats = quality_score(docs, text_col, id_col)
    score = (F.col("stopword_ratio") + F.col("distinct_ratio")
             - F.col("punct_ratio") - F.col("digit_ratio"))
    scored = docs.select(id_col, text_col).join(
        feats.select(id_col, score.alias("_q")), id_col)
    lo, hi = scored.approxQuantile("_q", [1.0 / 3, 2.0 / 3], 0.001)
    return (
        scored.withColumn(
            "label",
            F.when(F.col("_q") >= hi, F.lit(1.0))
            .when(F.col("_q") <= lo, F.lit(0.0)),
        )
        .filter(F.col("label").isNotNull())
        .select(id_col, text_col, "label")
    )


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             n_features: int = 1 << 18,
                             max_iter: int = 20, reg: float = 1e-4):
    """Fit Tokenizer -> HashingTF -> LogisticRegression on (text,
    label). Hashing keeps the feature space fixed-width (no vocabulary
    shuffle — the property that makes this trainable at corpus scale);
    the returned PipelineModel scores with one broadcast weight vector.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="_toks",
                         pattern=r"[^a-zA-Z0-9]+", toLowercase=True)
    tf = HashingTF(inputCol="_toks", outputCol="_feat",
                   numFeatures=n_features)
    lr = LogisticRegression(featuresCol="_feat", labelCol="label",
                            maxIter=max_iter, regParam=reg,
                            standardization=False)
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(model, docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, quality_prob): P(high quality) for every document — one
    JVM-side transform over the broadcast weights."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(docs.select(id_col, text_col))
    return out.select(
        id_col,
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )
