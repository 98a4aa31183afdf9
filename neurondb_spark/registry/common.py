"""Shared helpers for registry modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_DIM = 64  # driver embeddings.embedding dimension (oracle SQL generation)

# Distance-expression compilation strategy for registry queries:
# None → aggregate/zip_with fold (small analysis cost — wins when the scan
# is small, as with the 2k-row embeddings table); EMB_DIM → unrolled
# whole-stage-codegen chain (wins on large scans). Both produce
# bit-identical results (same left-assoc order), so the oracles don't care.
COMPILE_DIM: int | None = None

_qvec_cache: dict[tuple[str, int], list[float]] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics (date_trunc/epoch) must match DuckDB's naive
    # reads regardless of how the caller's session is configured
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """t() + repartition to defaultParallelism: for CPU-heavy per-row
    work (tokenize/regex/score) over the single-row-group test tables,
    which otherwise scan as ONE partition and serialize the work. Real
    corpora arrive multi-file; this guards the single-file case."""
    return t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


def qvec(spark: SparkSession, sf_dir: str, vid: int = 1) -> list[float]:
    """Deterministic query vector = stored embedding of vec_id=vid (cached;
    float32→Python float is exact so the Spark literal equals DuckDB's
    stored value bit-for-bit)."""
    key = (sf_dir, vid)
    if key not in _qvec_cache:
        row = (
            t(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") == vid)
            .select("embedding")
            .head()
        )
        _qvec_cache[key] = [float(x) for x in row[0]]
    return _qvec_cache[key]


QVEC_CTE = "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1)"


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table normalized to microsecond TimestampType.

    Handles both testdata generations: TIMESTAMP(NANOS) parquet (read as
    BIGINT via the legacy conf, then DIV 1000 — truncation, matching
    DuckDB's native nanos read) and plain TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ, cast to session-TZ timestamp — the UTC session makes
    the naive values identical to DuckDB's)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # match DuckDB's
    # naive reads for date_trunc/epoch regardless of caller session TZ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = ev.schema["ts"].dataType.typeName()
    if ts_type in ("long", "bigint"):
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))
