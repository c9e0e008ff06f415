"""Learned quality gate (operators/quality_model.py): separable
synthetic corpora must be learned ~perfectly; degenerate slices must
degrade to the majority predictor, never crash."""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators.quality_model import (
    quality_classifier_report,
    train_quality_classifier,
)


def _corpus(spark):
    # even ids: long, stopword-rich English (gopher keep=True);
    # odd ids: short symbol noise (keep=False) — linearly separable on
    # n_tokens/stopword_ratio, so the learned gate must hit ~100%.
    good = (
        "the quick brown foxes have jumped over the lazy dogs "
        "with great energy and style " * 2
    )
    bad = "@@ ## $$ %% ^^"
    rows = [(i, good if i % 2 == 0 else bad) for i in range(80)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_separable_corpus_learned_perfectly(spark):
    rep = quality_classifier_report(_corpus(spark), F.col("doc_id") % 4 < 2).collect()[0]
    # split %4<2 puts both classes in both slices
    assert rep.n_train == 40 and rep.n_eval == 40
    assert rep.accuracy_bp == 10000
    assert rep.beats_baseline_ok == 1
    assert rep.lift_bp == 10000 - rep.baseline_bp > 0


def test_one_class_train_slice_degrades_to_majority(spark):
    good = (
        "the quick brown foxes have jumped over the lazy dogs "
        "with great energy and style " * 2
    )
    rows = [(i, good) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rep = quality_classifier_report(docs, F.col("doc_id") < 10).collect()[0]
    # all-keep corpus: LR fits the constant class; baseline == accuracy
    assert rep.accuracy_bp == 10000 and rep.baseline_bp == 10000
    assert rep.beats_baseline_ok == 1


def test_empty_train_slice_guarded(spark):
    rep = quality_classifier_report(
        _corpus(spark), F.lit(False)
    ).collect()[0]
    assert rep.n_train == 0 and rep.n_eval == 80
    # constant-0 fallback: half the docs are keep=False -> 50% right
    assert rep.accuracy_bp == 5000


def test_trained_model_scores_new_corpus_map_only(spark):
    model = train_quality_classifier(_corpus(spark))
    fresh = spark.createDataFrame(
        [
            (
                100,
                "the quick brown foxes have jumped over the lazy dogs "
                "with great energy and style " * 2,
            )
        ],
        "doc_id long, text string",
    )
    from factstore_spark.operators.quality_model import _featurize

    out = model.transform(_featurize(fresh, "text"))
    assert out.select("prediction").collect()[0][0] == 1.0


def test_model_persists_and_reloads(spark, tmp_path):
    """Train once, save, reload in a fresh handle, score identically —
    the production path: the gate is fitted by a training job and
    SHIPPED to every downstream scoring job (batch or stream)."""
    from pyspark.ml import PipelineModel

    model = train_quality_classifier(_corpus(spark))
    path = str(tmp_path / "quality-gate-model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)

    from factstore_spark.operators.quality_model import _featurize

    feats = _featurize(_corpus(spark), "text")
    want = [(r.doc_id, r.prediction) for r in model.transform(feats).select("doc_id", "prediction").collect()]
    got = [(r.doc_id, r.prediction) for r in reloaded.transform(feats).select("doc_id", "prediction").collect()]
    assert sorted(got) == sorted(want) and want
