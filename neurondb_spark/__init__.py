"""neurondb-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the NeuronDB reference (a PostgreSQL
extension; see SURVEY.md for the full structural analysis).

Layout
------
- ``neurondb_spark.session``    — SparkSession factory + config namespace
- ``neurondb_spark.functions``  — scalar vector/distance/text functions as
  pure Column expressions (JVM-side, no Python UDFs on the hot path)
- ``neurondb_spark.operators``  — DataFrame→DataFrame transforms: kNN,
  hybrid search, similarity join, dedup, rerank, graph
- ``neurondb_spark.index``      — IVF (KMeans + partition pruning) / LSH
  batch-built ANN indexes
- ``neurondb_spark.ml``         — train/predict/evaluate unified API over
  MLlib with the reference's model-catalog contract
- ``neurondb_spark.streaming``  — job-queue / monitor workers as
  Structured Streaming jobs
- ``neurondb_spark.oracle``     — ANSI/DuckDB SQL generators that mirror the
  Column expressions bit-for-bit (used by the correctness gate)
"""

__version__ = "0.1.0"
