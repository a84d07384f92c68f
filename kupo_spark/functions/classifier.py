"""Model-based quality filtering — the learned stage of a training-data
pipeline (the fastText/linear classifier of CCNet, RefinedWeb, FineWeb).

Two halves with very different scale profiles, deliberately split:

- **Training** (:func:`train_quality_classifier`) runs Spark MLlib
  logistic regression over the heuristic text features
  (:func:`kupo_spark.functions.textops.quality_score`), with the Gopher
  rule verdict as the default weak label — the standard bootstrap when no
  human labels exist.  Training touches a sample; it does NOT need to be
  cheap.  The result is a plain :class:`QualityModel` dataclass (weights,
  intercept, feature names) — the model leaves MLlib immediately.
- **Scoring** (:func:`score_quality`) is the 100 TB side: the model is
  folded into ONE codegen expression — sigmoid(w·x + b) over the same
  feature projection — so the hot path has no MLlib, no UDF, no Python,
  and fuses into the same whole-stage-codegen scan as the feature
  computation itself.  The parity of the two paths (MLlib ``transform``
  vs the folded expression) is pinned by test to < 1e-9.

Reference analog: none — extends the LLM-data-pipeline family
(SURVEY.md §2, pipeline operators).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.textops import quality_score

#: feature columns fed to the classifier, in weight order
FEATURES = [
    "stopword_ratio",
    "quality_score",
    "n_tokens",
    "avg_token_len",
    "frac_dup_2gram",
    "top_2gram_frac",
]


@dataclass(frozen=True)
class QualityModel:
    features: tuple[str, ...]
    weights: tuple[float, ...]
    intercept: float

    def score_expr(self) -> str:
        """The whole model as one SQL expression: sigmoid(w·x + b)."""
        dot = " + ".join(
            f"({w!r} * cast({f} as double))"
            for f, w in zip(self.features, self.weights)
        )
        return f"1.0 / (1.0 + exp(-({dot} + {self.intercept!r})))"


#: one L2-regularized training run (sf0.001, reg_param=0.01), frozen as
#: literals: the SCORING path — the 100 TB side — gets a driver-checked
#: DuckDB oracle (the training side is MLlib's, pinned by the parity test)
FROZEN_QUALITY_MODEL = QualityModel(
    features=tuple(FEATURES),
    weights=(0.248369, 24.992556, 0.032772, 0.095865, 18.384326, -58.317366),
    intercept=-1.167894,
)


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame | None = None,
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> QualityModel:
    """Fit logistic regression on the heuristic features.  ``labels`` is
    (doc_id, label double) — default: the Gopher rule verdict as a weak
    label.  Features are standardized internally by MLlib; the returned
    weights are on the ORIGINAL feature scale (MLlib de-standardizes), so
    the folded scoring expression needs no scaler state."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_score(docs)
    if labels is None:
        # same projection, no self-join: joining feats back onto itself
        # would evaluate the O(len²) 2-gram lineage twice plus an exchange
        data = feats.withColumn("label", F.col("gopher_pass").cast("double"))
    else:
        data = feats.join(labels, "doc_id")
    # snapshot the features before LBFGS: each iteration re-evaluates the
    # input, and the O(len²) 2-gram feature lineage is expensive to replay
    assembled = VectorAssembler(
        inputCols=FEATURES, outputCol="features", handleInvalid="skip"
    ).transform(data).select("doc_id", "features", "label").persist()
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features",
        labelCol="label",
    )
    m = lr.fit(assembled)
    assembled.unpersist()
    return QualityModel(
        features=tuple(FEATURES),
        weights=tuple(float(w) for w in m.coefficients),
        intercept=float(m.intercept),
    )


def score_quality(
    docs: DataFrame, model: QualityModel, threshold: float = 0.5
) -> DataFrame:
    """(doc_id, prob, pred): classifier probability and verdict for every
    document — one codegen projection over the feature scan, no MLlib."""
    feats = quality_score(docs)
    prob = model.score_expr()
    return feats.select(
        "doc_id",
        F.expr(prob).alias("prob"),
        (F.expr(prob) >= threshold).alias("pred"),
    )
