"""Isolated per-query timing at bench cadence (min of N runs of
queries()[name].count()) for optimization-round before/after evidence.

Usage: python scripts/r15_time_queries.py [--runs N] <name> [<name> ...]
Prints one JSON line {name: [runs...]} plus min/median per query.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from neurondb_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("neurondb-r15-timing")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd

    spark.createDataFrame(_pd.DataFrame({"x": range(256)})).mapInPandas(
        lambda it: it, "x long"
    ).count()
    qs = entrymod.queries()
    out = {}
    for name in names:
        q = qs[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        ss = sorted(samples)
        med = ss[len(ss) // 2] if len(ss) % 2 else (
            ss[len(ss) // 2 - 1] + ss[len(ss) // 2]) / 2
        print(f"# {name}: runs={samples} min={min(samples)} "
              f"median={med} rows={n}", flush=True)
        out[name] = samples
    print(json.dumps(out))


if __name__ == "__main__":
    main()
