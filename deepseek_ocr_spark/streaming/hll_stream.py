"""Streaming distinct-count sketch — the HLL register table maintained
incrementally over a document stream (batch analog:
operators/corpus_stats.hll_distinct; SAME expression module, never forked).

The register table IS the streaming state: groupBy(bucket).max(rho) under
``update``/``complete`` output mode keeps exactly 256 rows of state
regardless of stream length — the canonical "mergeable sketch" property,
demonstrated live: a max-aggregate is associative/commutative, so each
micro-batch folds into state without reprocessing history. After ANY
prefix of the stream the register table equals the batch operator's
registers over the same prefix (pinned by batch-equality in
tests/test_streaming.py).

At 100 TB-ingest scale this replaces a nightly COUNT(DISTINCT) over the
full corpus with O(256) state per counted column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from deepseek_ocr_spark.operators.corpus_stats import hll_registers


def hll_registers_stream(docs: DataFrame, col: str = "text") -> DataFrame:
    """stream of documents → streaming (bucket, m_j) register table.
    The batch expression tree applies verbatim — hll_registers is
    streaming-safe because its only aggregate is a max."""
    return hll_registers(docs, col)
