"""driver_sim under a bare SparkSession — no Arrow, no engine confs.

The gate-environment repro mode (round-5 verdict "Next round #2"): every
conf-sensitive bug so far (the four-round `stream_job_queue` Arrow-off
schema-inference red) was invisible to driver_sim/hostile_sim because
both inherit get_spark's Arrow=true. Run this over the full registry
before committing registry changes:

    python scripts/vanilla_sim.py [sf_dir] [query1,query2,...]
"""

from __future__ import annotations

import sys

import driver_sim

if __name__ == "__main__":
    sys.argv.append("--vanilla")
    driver_sim.main()
