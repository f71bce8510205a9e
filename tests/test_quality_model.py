"""Distilled quality classifier: Spark-vs-replay bit parity, partition
invariance, sample_mod slicing, JVM-only scoring plan, and failure paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators import quality_model as qm

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _replay_inputs(sample_mod=1):
    import duckdb

    from openccnet_spark.operators.textstats import sql_quality_score_milli

    mf = qm.sql_milli_features("text")
    q = sql_quality_score_milli("text")
    rows = duckdb.sql(
        f"""SELECT doc_id, text,
               CASE WHEN {q} >= {qm.QM_TEACHER_MILLI} THEN 1 ELSE 0 END,
               {mf['lm']}, {mf['uq']}, {mf['sm']}
            FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    return qm.classifier_replay(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows],
        [r[3] for r in rows], [r[4] for r in rows], [r[5] for r in rows],
        sample_mod=sample_mod,
    )


def test_train_matches_replay_and_partition_invariant(spark, docs):
    w = qm.train_distributed(docs, sample_mod=2)
    assert np.array_equal(w, _replay_inputs(sample_mod=2))
    # order-free integer sums => bit-identical at any partitioning
    w17 = qm.train_distributed(docs.repartition(17), sample_mod=2)
    assert np.array_equal(w, w17)


def test_sample_mod_changes_the_slice(spark, docs):
    w2 = qm.train_distributed(docs, sample_mod=2)
    w5 = qm.train_distributed(docs, sample_mod=5)
    assert not np.array_equal(w2, w5)
    assert np.array_equal(w5, _replay_inputs(sample_mod=5))


def test_scoring_agreement_and_jvm_only_plan(spark, docs):
    wq = qm.quantize_weights(qm.train_distributed(docs, sample_mod=2))
    scored = qm.score_frame(docs, wq)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan  # serving is pure JVM
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    rows = scored.collect()
    assert len(rows) == docs.count()
    agree = sum(r.pred == r.label for r in rows) / len(rows)
    assert agree >= 0.95  # the distillation actually works
    for r in rows[:50]:
        assert r.pred == (1 if r.score_q >= 0 else 0)


def test_empty_training_raises_without_leaking_handles(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    handles: list = []
    with pytest.raises(ValueError, match="empty training set"):
        qm.train_distributed(empty, handles=handles)
    assert handles == []  # nothing persisted left for the caller to release


def test_quantize_weights_floor():
    w = np.array([1.5, -1.5, 0.0])
    wq = qm.quantize_weights(w)
    assert wq[0] == int(np.floor(1.5 * qm.QM_QUANT / 1000.0))
    assert wq[1] == int(np.floor(-1.5 * qm.QM_QUANT / 1000.0))  # floor, not trunc
    assert wq[2] == 0
