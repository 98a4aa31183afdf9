"""Batch-built ANN index layer (SURVEY §2.5, §2.11).

The reference's two index AMs map onto Spark-native layouts:

- IVF (src/index/ivf_am.c) → ivf.py: MLlib KMeans centroids + data
  partitioned by cluster_id on disk; a query probes nprobe clusters via
  partition pruning. Same recall/probe semantics, but build and search are
  distributed.
- HNSW (src/index/hnsw_am.c) → the graph is a pointer-chasing in-memory
  structure that does not map onto a scan-based engine; its *niche*
  (sub-linear approx kNN) is served by lsh.py (random-hyperplane buckets)
  and by IVF with small nprobe. Exactness fallback is the partition-parallel
  top-k (TakeOrderedAndProject).
"""

from neurondb_spark.index.ivf import IVFIndex  # noqa: F401
from neurondb_spark.index.lsh import LSHIndex  # noqa: F401
