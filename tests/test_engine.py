"""Engine facade: index-aware kNN routing + end-to-end workflow."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_engine_workflow(spark):
    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.registry.common import qvec

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="engine_cat_"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = qvec(spark, SF_DIR, 3)

    # no index → exact route
    assert eng.explain_route()["route"] == "exact"
    exact = eng.knn(emb, "embedding", q, k=5, dim=64, tiebreak=["vec_id"])
    exact_ids = [r["vec_id"] for r in exact.collect()]
    assert exact_ids[0] == 3  # self-match first

    # build an index; small table still routes exact by the honest rule
    eng.create_index("emb_ivf", emb, "embedding", method="ivf", nlists=8, dim=64)
    route_small = eng.explain_route("emb_ivf", n_rows=emb.count())
    assert route_small["route"] == "exact" and "scan beats probe" in route_small["reason"]

    # a big (claimed) table routes through the index
    route_big = eng.explain_route("emb_ivf", n_rows=10_000_000)
    assert route_big["route"] == "ivf"

    # ML through the facade
    df = emb.withColumn("y", (F.col("label") < 5).cast("double"))
    mid = eng.train(df, "logistic_regression", ["embedding"], target="y")
    m = eng.evaluate(df, mid)
    assert m["accuracy"] > 0.4
    assert any(a["algorithm"] == "kmeans" for a in eng.list_algorithms())

    # config namespace + health + metrics
    eng.set_config("hnsw.ef_search", "128")
    assert eng.get_config("hnsw.ef_search") == "128"
    assert eng.health()["status"] == "ok"
    assert "knn_calls" in eng.metrics.prometheus()
    assert eng.version()
