"""Simulate the driver's verify pass end-to-end:

1. smoke: entry(spark) at sf0.001 → rows + stable schema
2. correctness: each queries()[name] at sf0.01 vs oracle_sql()[name] in
   DuckDB — row-count + sorted-column schema + order-insensitive value hash
3. prints a CORRECTNESS-style JSON summary

This is the engine's public surface exactly as the driver consumes it.

``--vanilla`` (or env NEURONDB_SIM_VANILLA=1) runs the whole pass under a
BARE ``SparkSession.builder`` — no Arrow, no engine confs, default driver
memory. This is the environment class the real gate runs: the four-round
`stream_job_queue` red was an Arrow-off schema-inference bug that every
local harness missed because they all inherit get_spark's Arrow=true.
Any conf-sensitive bug is only visible here — run this mode before
committing registry changes.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from neurondb_spark.session import get_spark  # noqa: E402


def vanilla_spark():
    """A gate-like session: NOTHING the engine's get_spark sets — PySpark
    defaults for Arrow (off), shuffle partitions (200), driver memory."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("vanilla-sim")
        .getOrCreate()
    )

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        for v in pdf[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]


def main() -> None:
    # Gate-integrity (round-6 verdict #1): in the sims, a streaming gate
    # row must prove its STREAMING path — the batch-twin fallback becomes
    # a hard raise. The real driver gate (which imports __spark_entry__
    # directly) keeps the infra-only fallback for flaky-load resilience.
    os.environ.setdefault("NEURONDB_STRICT_STREAM", "1")
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = ("--vanilla" in sys.argv[1:]) or (
        os.environ.get("NEURONDB_SIM_VANILLA") == "1"
    )
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    only = set(args[1].split(",")) if len(args) > 1 else None
    spark = vanilla_spark() if vanilla else get_spark("driver-sim")
    print(f"session: {'VANILLA (no engine confs, Arrow off)' if vanilla else 'get_spark'}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    smoke = entrymod.entry(spark)
    rows = smoke.collect()
    print(f"smoke: entry() -> {len(rows)} rows, schema={[f.name for f in smoke.schema]}")

    results = {}
    oracles = entrymod.oracle_sql()
    for name, q in entrymod.queries().items():
        if only is not None and name not in only:
            continue
        sdf = q(spark, sf_dir).toPandas()
        if name not in oracles:
            results[name] = {"mode": "rows_only", "rows": len(sdf), "ok": True}
            continue
        ddf = con.sql(oracles[name]).fetchdf()
        ok_rows = len(sdf) == len(ddf)
        ok_schema = sorted(sdf.columns) == sorted(ddf.columns)
        hs, hd = value_hash(sdf), value_hash(ddf)
        results[name] = {
            "mode": "oracle",
            "rows": len(sdf),
            "rows_match": ok_rows,
            "schema_match": ok_schema,
            "hash_match": hs == hd,
            "ok": ok_rows and ok_schema and hs == hd,
        }
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps({"sf_dir": sf_dir, "passed": n_ok, "total": len(results), "queries": results}, indent=1))
    if n_ok != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
