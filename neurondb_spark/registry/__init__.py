"""Query registry: every implemented operator from SURVEY §2 declares a
(spark_fn, oracle_sql) pair here; __spark_entry__ aggregates them for the
driver's correctness gate.

Each submodule exposes ``QUERIES: dict[str, tuple[callable, str | None]]``
where callable(spark, sf_dir) -> DataFrame and the str is DuckDB SQL
(None → non-SQL-expressible op, rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect() -> dict[str, tuple[QueryFn, str | None]]:
    from neurondb_spark.registry import (
        composite_queries,
        core,
        embed_rerank,
        events,
        index_queries,
        metrics_extra,
        misc_queries,
        ml_queries,
        quality_queries,
        quant_graph,
        search,
        text_pipeline,
        timeseries_rel,
        vector_ops_queries,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        core, search, text_pipeline, events, index_queries, ml_queries,
        embed_rerank, quant_graph, timeseries_rel, vector_ops_queries,
        metrics_extra, misc_queries, composite_queries, quality_queries,
    ):
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    return out
