"""Trained quality-classifier gate — the LEARNED stage of a corpus
quality pipeline (fastText/CCNet-style: hand-tuned heuristics bootstrap
weak labels, a linear model trained on cheap features generalizes
them; reference parity: complements the heuristic filters in text.py
the way a production LLM-data pipeline layers a learned gate on top of
rule filters).

Spark-first shape: feature extraction is whole-stage-codegen built-in
expressions (with_quality_score — no Python, no shuffle), training is
``pyspark.ml`` LogisticRegression (each LBFGS iteration is ONE
treeAggregate of map-side gradient partials over the feature frame —
no row shuffle, driver state is O(n_features)), and scoring is a
map-only model transform. At 100 TB the only multi-pass cost is the
bounded iteration count; everything else is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import with_gopher_rules, with_quality_score

FEATURES = ["n_tokens", "mean_word_len", "stopword_ratio", "alpha_ratio"]


def score_features(df: DataFrame, text_col: str) -> DataFrame:
    """The 4 model features only — the SCORING path's featurizer. The
    Gopher rules exist solely to manufacture the training label;
    running their ~8 extra regex/array expressions per row on a hot
    scoring path (every micro-batch of a 100 TB stream) would be pure
    waste, so transform-time callers use this."""
    return with_quality_score(df, text_col).withColumn(
        "n_tokens", F.col("n_tokens").cast("double")
    )


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    """Features + the Gopher-rule weak label — the TRAINING frame."""
    return score_features(with_gopher_rules(df, text_col=text_col), text_col).withColumn(
        "label", F.col("keep").cast("double")
    )


def _fit(feats: DataFrame, max_iter: int, reg_param: float):
    """One fit definition for the production train path AND the battery
    contract — diverging hyper-parameters between the two would make
    the contract test a different model than users ship."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features")
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        labelCol="label",
        featuresCol="features",
    )
    model = Pipeline(stages=[assembler, lr]).fit(feats)
    # Drop the fitted LR's training summary: it is never read here, and
    # it pins the whole SparkSession into every task closure that
    # serializes the model (transform's prediction UDF captures the
    # model -> trainingSummary -> summary.sparkSession — the field is
    # not @transient in Spark 4.x). That made scoring fail with
    # "NotSerializableException: ObservationManager" in any session
    # that had ever used DataFrame.observe (the lazy observationManager
    # field is only serialization-safe while still null). private[ml]
    # members are public in bytecode, so the py4j call is stable; guard
    # anyway — a failure just means the summary rides along as before.
    try:
        jlr = model.stages[-1]._java_obj
        getattr(jlr, "trainingSummary_$eq")(
            feats.sparkSession._jvm.scala.Option.empty()
        )
    except Exception:
        pass
    return model


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    """Fit the linear quality gate on Gopher-rule weak labels. Returns
    the fitted pipeline model (assembler + logistic regression) for
    map-only scoring of any corpus carrying the FEATURES columns
    (score_features builds them from a text column)."""
    return _fit(_featurize(df, text_col), max_iter, reg_param)


def quality_classifier_report(
    df: DataFrame,
    train,
    text_col: str = "text",
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> DataFrame:
    """Train on the ``train`` slice, score the held-out slice, and emit
    ONE self-validating row: the learned gate must match the weak
    labels on unseen docs at least as well as always-guessing the
    majority class (``beats_baseline_ok`` = accuracy_bp >= baseline_bp;
    ``lift_bp`` is the margin). All contract columns are integer
    counts/basis points — low-bit coefficient drift from gradient-sum
    order can only move a doc sitting exactly on the decision
    boundary, never the counts' scale — so the row is stable across
    partitionings.

    Columns: n_train, n_eval, n_keep_eval (weak-label positives),
    baseline_bp, accuracy_bp, lift_bp, beats_baseline_ok.
    """
    feats = _featurize(df, text_col)
    # cache: the count below materializes the featurized train slice
    # once and LBFGS's iterations then read the cached frame instead of
    # re-featurizing per pass (pyspark.ml itself warns on uncached fit
    # input); one action serves both the empty-slice guard and the
    # n_train contract column.
    train_df = feats.filter(train).persist()
    eval_df = feats.filter(~train)
    try:
        n_train = train_df.count()
        # a one-class training slice (tiny or pathologically filtered
        # corpus) still fits — LR degenerates to the constant majority
        # predictor — but guard the truly empty slice explicitly
        model = _fit(train_df, max_iter, reg_param) if n_train else None
    finally:
        train_df.unpersist()
    scored = (
        model.transform(eval_df)
        if model is not None
        else eval_df.withColumn("prediction", F.lit(0.0))
    )
    row = (
        scored.agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.coalesce(F.sum((F.col("label") == 1.0).cast("long")), F.lit(0))
            .cast("long")
            .alias("n_keep_eval"),
            F.coalesce(
                F.sum((F.col("prediction") == F.col("label")).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("n_correct"),
        )
        .withColumn(
            "baseline_bp",
            F.when(F.col("n_eval") == 0, F.lit(10000))
            .otherwise(
                F.expr(
                    "(10000 * greatest(n_keep_eval, n_eval - n_keep_eval))"
                    " div n_eval"
                )
            )
            .cast("long"),
        )
        .withColumn(
            "accuracy_bp",
            F.when(F.col("n_eval") == 0, F.lit(10000))
            .otherwise(F.expr("(10000 * n_correct) div n_eval"))
            .cast("long"),
        )
        .withColumn(
            "lift_bp", (F.col("accuracy_bp") - F.col("baseline_bp")).cast("long")
        )
        .select("n_eval", "n_keep_eval", "baseline_bp", "accuracy_bp", "lift_bp")
        .collect()[0]
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                n_train,
                row.n_eval,
                row.n_keep_eval,
                row.baseline_bp,
                row.accuracy_bp,
                row.lift_bp,
                1 if row.accuracy_bp >= row.baseline_bp else 0,
            )
        ],
        "n_train long, n_eval long, n_keep_eval long, baseline_bp long, "
        "accuracy_bp long, lift_bp long, beats_baseline_ok long",
    )
