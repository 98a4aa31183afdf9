"""Every declared query must hash-match its DuckDB oracle — this mirrors the
driver's CORRECTNESS gate (BASELINE.md: t2) locally, with EXACT float
comparison (stricter than any hash)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR, compare_frames  # noqa: E402

QUERIES = sorted(entrymod.queries().keys())

# Rows whose DUCKDB oracle replay dominates the test (measured on the
# oracle alone: the shared quality-classifier chained CTE is
# single-thread-bound at ~60s EACH, flat from 8 to 32 duckdb threads;
# the five BPE rows replay 10-merge chained CTEs at 11-12s each) while
# duplicating coverage the driver's own CORRECTNESS rotation re-checks
# against the SAME oracle SQL. Extended lane: `pytest -m slow`.
_SLOW_ORACLE_REPLAY = {
    "quality_classifier_scores",
    "corpus_curation_pipeline",
    "repetition_quality_filters",
    "bpe_merges_topk",
    "bpe_tokenize_counts",
    "bpe_hf_import_counts",
    "bpe_hybrid_merges",
    "bpe_saved_tokenize_counts",
    "bpe_facade_tokenize_counts",
    # Spark-side outlier, not DuckDB: the exact-parity compare fully
    # materializes a heavyweight per-row expression chain the bench's
    # count() action prunes — 20-25s for one row. Driver-gated in
    # rotation like the rest of the slow set.
    "vector_preprocess_ops",
}


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE_REPLAY
     else n for n in QUERIES],
)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    sdf = q(spark, SF_DIR)
    rel = duck.sql(oracles[name])
    compare_frames(sdf, rel)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
