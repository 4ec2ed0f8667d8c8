"""components_from_edges: long-chain convergence (exercises the periodic
localCheckpoint lineage truncation) and the loud non-convergence contract —
exhausting max_iter with labels still moving must RAISE, never return a
partially-propagated labeling (VERDICT r2 'What's wrong' #3)."""

import pytest

from deepseek_ocr_spark.operators.dedup import components_from_edges


def _chain(spark, n):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id BIGINT")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src BIGINT, dst BIGINT"
    )
    return nodes, edges


def test_long_chain_converges_past_checkpoint_rounds(spark):
    # diameter 11 > _CHECKPOINT_EVERY=5: min-label needs 11 propagation
    # rounds, crossing two localCheckpoint truncations on the way
    nodes, edges = _chain(spark, 12)
    out = components_from_edges(nodes, edges, max_iter=15)
    rows = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert rows == {i: 0 for i in range(12)}


def test_two_components_and_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id BIGINT")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src BIGINT, dst BIGINT"
    )
    out = components_from_edges(nodes, edges)
    rows = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert rows == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_non_convergence_raises(spark):
    nodes, edges = _chain(spark, 12)
    with pytest.raises(RuntimeError, match="did not converge"):
        components_from_edges(nodes, edges, max_iter=3)


def test_zero_max_iter_rejected_up_front(spark):
    # max_iter=0 would skip the loop entirely and silently return the
    # identity labeling — the same wrong-answer class as non-convergence
    nodes, edges = _chain(spark, 3)
    with pytest.raises(ValueError, match="max_iter"):
        components_from_edges(nodes, edges, max_iter=0)
