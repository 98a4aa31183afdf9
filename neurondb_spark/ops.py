"""Multi-tenancy, quotas, config, metrics, diagnostics (SURVEY §2.12).

Reference: RLS tenant policies (neurondb--1.0.sql:2972-2978,
src/scan/scan_rls.c), quota checks (:2999-3019, scan_quota.c), vector
config GUCs (:4310-4330), pg_stat_neurondb metrics (:4421-4433),
explain_vector_query (:4407).

Spark mapping: tenancy is a mandatory-filter view layer (the engine never
hands out the unfiltered frame); quotas are catalog counters checked
before work is scheduled; metrics ride on Spark's instrumentation.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.catalog import Catalog
from neurondb_spark.session import get_conf, set_conf  # noqa: F401  (config surface)


def tenant_view(df: DataFrame, tenant_col: str, tenant_id) -> DataFrame:
    """RLS analog: a frame pre-filtered to one tenant. The predicate is a
    plain filter, so Catalyst pushes it into the scan (partition pruning
    when the data is partitioned by tenant — the recommended layout)."""
    return df.where(F.col(tenant_col) == F.lit(tenant_id))


class QuotaManager:
    """neurondb_check_quota / get_quota_usage / reset_quota
    (neurondb--1.0.sql:2999-3019) over catalog counters."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def set_quota(self, tenant: str, max_rows: int) -> None:
        self.catalog.register("quotas", tenant, {"max_rows": max_rows, "used_rows": 0})

    def check_and_consume(self, tenant: str, rows: int) -> bool:
        q = self.catalog.get("quotas", tenant)
        if q is None:
            return True  # no quota configured
        if q["used_rows"] + rows > q["max_rows"]:
            return False
        q["used_rows"] += rows
        self.catalog.register("quotas", tenant, q)
        return True

    def usage(self, tenant: str) -> dict | None:
        return self.catalog.get("quotas", tenant)

    def reset(self, tenant: str) -> None:
        q = self.catalog.get("quotas", tenant)
        if q:
            q["used_rows"] = 0
            self.catalog.register("quotas", tenant, q)


class Metrics:
    """pg_stat_neurondb analog: per-operation counters + timings, dumpable
    as a DataFrame or prometheus-style text."""

    def __init__(self):
        self.counters: dict[str, int] = {}
        self.timings: dict[str, float] = {}

    def incr(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def time(self, name: str):
        m = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                m.timings[name] = m.timings.get(name, 0.0) + time.perf_counter() - self.t0
                m.incr(name + "_calls")

        return _Timer()

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [(k, float(v), "count") for k, v in sorted(self.counters.items())] + [
            (k, v, "seconds") for k, v in sorted(self.timings.items())
        ]
        return spark.createDataFrame(rows, "metric string, value double, unit string")

    def prometheus(self) -> str:
        """neurondb_prometheus_metrics (neurondb--1.0.sql:6193-6241)."""
        lines = [f"neurondb_{k} {v}" for k, v in sorted(self.counters.items())]
        lines += [f"neurondb_{k}_seconds {v}" for k, v in sorted(self.timings.items())]
        return "\n".join(lines)


def health(spark: SparkSession) -> dict:
    """neurondb.health (neurondb--1.0.sql:6472)."""
    sc = spark.sparkContext
    return {
        "status": "ok",
        "spark_version": spark.version,
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "app_id": sc.applicationId,
    }


def explain_vector_query(df: DataFrame, mode: str = "formatted") -> str:
    """explain_vector_query (neurondb--1.0.sql:4407): the physical plan —
    check PushedFilters / PartitionFilters / WholeStageCodegen spans."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_vector_equal(a: list[float], b: list[float], tol: float = 0.0) -> None:
    """assert_vector_equal test helper (neurondb--1.0.sql:4389-4398)."""
    if len(a) != len(b):
        raise AssertionError(f"dim mismatch: {len(a)} != {len(b)}")
    for i, (x, y) in enumerate(zip(a, b)):
        if abs(x - y) > tol:
            raise AssertionError(f"element {i}: {x} != {y} (tol={tol})")


def assert_recall(got_ids: list, want_ids: list, min_recall: float) -> float:
    """assert_recall helper (neurondb--1.0.sql:4389): recall of got vs
    ground-truth ids; raises below threshold, returns the recall."""
    if not want_ids:
        return 1.0
    r = len(set(got_ids) & set(want_ids)) / len(set(want_ids))
    if r < min_recall:
        raise AssertionError(f"recall {r:.3f} < required {min_recall}")
    return r
