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

    # a big (claimed) table routes through the index when the probe is
    # selective (nprobe << nlists)...
    route_big = eng.explain_route("emb_ivf", n_rows=10_000_000, nprobe=2)
    assert route_big["route"] == "ivf"
    # ...but a full probe (nprobe >= nlists) honestly costs more than the
    # scan, so the cost model routes it exact (SURVEY §4)
    route_full = eng.explain_route("emb_ivf", n_rows=10_000_000, nprobe=8)
    assert route_full["route"] == "exact"
    assert "probe cost" in route_full["reason"]

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


def test_engine_knn_indexed_path_runs_no_count_job(spark):
    """Routing must use the catalog's build-time row count — a count job
    per query is a driver bottleneck at scale (round-2 ADVICE)."""
    import pytest

    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.registry.common import qvec

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="engine_cat2_"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = qvec(spark, SF_DIR, 3)
    eng.create_index("emb_lsh", emb, "embedding", method="lsh", dim=64, nbits=6)
    # build-time row count was cataloged (for both index kinds)
    assert eng.catalog.get("indexes", "emb_lsh")["rows"] == emb.count()

    emb.count = lambda: (_ for _ in ()).throw(  # pragma: no cover
        AssertionError("engine.knn must not run a count job on df")
    )
    # small table -> honest rule still routes exact, using cataloged rows
    assert eng.explain_route("emb_lsh")["route"] == "exact"
    out = eng.knn(emb, "embedding", q, k=3, dim=64, index="emb_lsh",
                  tiebreak=["vec_id"])
    assert out.count() >= 1

    # Column queries must be rejected on the indexed path, not silently
    # searched with a stale interpretation
    eng.catalog.register(
        "indexes", "emb_lsh",
        {**eng.catalog.get("indexes", "emb_lsh"), "rows": 10_000_000},
    )
    with pytest.raises(ValueError, match="literal query vector"):
        eng.knn(emb, "embedding", F.col("embedding"), k=3, index="emb_lsh")
    with pytest.raises(ValueError, match="query dim"):
        eng.knn(emb, "embedding", [0.0, 1.0], k=3, index="emb_lsh")


def test_engine_knn_batch_all_routes(spark):
    """knn_batch routes: exact broadcast join, IVF shared pruned scan,
    HNSW one-pass-per-shard, LSH shared bucket-probe join — each must
    agree with per-query knn()."""
    import tempfile

    from pyspark.sql import functions as F

    from neurondb_spark.engine import NeuronSparkEngine
    from tests.conftest import SF_DIR

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="eng_batch_"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id").isin(1, 4)).collect()
    ]

    def by_qid(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], []).append(r["vec_id"])
        return out

    exact = by_qid(eng.knn_batch(emb, "embedding", qrows, k=5,
                                 tiebreak=["vec_id"]))
    for qid, vec in qrows:
        single = [r["vec_id"] for r in
                  eng.knn(emb, "embedding", vec, k=5,
                          tiebreak=["vec_id"]).collect()]
        assert exact[qid] == single, ("exact", qid)

    # the sf0.01 corpus sits under the scan-beats-probe floor, and a
    # full probe fails the cost rule too — pin route.mode=index (the
    # enable_seqscan=off analog) for the probe-path checks. The spark
    # conf is session-shared, so the WHOLE body is under try/finally
    # (r8 verdict: a partial finally leaked the forced route into every
    # later test on mid-test assertion failure).
    eng.set_config("route.mode", "index")
    try:
        eng.create_index("b_ivf", emb, "embedding", method="ivf", nlists=8)
        got = by_qid(eng.knn_batch(emb, "embedding", qrows, k=5, index="b_ivf",
                                   nprobe=8, tiebreak=["vec_id"]))
        for qid, vec in qrows:
            single = [r["vec_id"] for r in
                      eng.knn(emb, "embedding", vec, k=5, index="b_ivf",
                              nprobe=8, tiebreak=["vec_id"]).collect()]
            assert got[qid] == single, ("ivf", qid)

        eng.create_index("b_hnsw", emb, "embedding", method="hnsw",
                         id_col="vec_id", num_shards=2, m=8,
                         ef_construction=48)
        got = by_qid(eng.knn_batch(emb, "embedding", qrows, k=5,
                                   index="b_hnsw", ef_search=128))
        for qid, vec in qrows:
            single = [r["vec_id"] for r in
                      eng.knn(emb, "embedding", vec, k=5, index="b_hnsw",
                              ef_search=128).collect()]
            assert got[qid] == single, ("hnsw", qid)

        eng.create_index("b_lsh", emb, "embedding", method="lsh", dim=64,
                         nbits=6)
        got = by_qid(eng.knn_batch(emb, "embedding", qrows, k=5,
                                   index="b_lsh", probe_hamming=2,
                                   tiebreak=["vec_id"]))
        for qid, vec in qrows:
            single = [r["vec_id"] for r in
                      eng.knn(emb, "embedding", vec, k=5, index="b_lsh",
                              probe_hamming=2, tiebreak=["vec_id"]).collect()]
            assert got[qid] == single, ("lsh", qid)
    finally:
        eng.set_config("route.mode", "auto")


def test_routing_cost_model_two_sizes(spark):
    """r8 verdict #7: routing is the SURVEY §4 cost rule in distance
    evaluations — build params and the caller's nprobe/ef_search factored
    in — checked at two synthetic table sizes, plus the route.mode
    overrides (enable_seqscan/enable_indexscan analogs)."""
    from neurondb_spark.engine import NeuronSparkEngine

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="eng_cost_"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    eng.create_index("c_ivf", emb, "embedding", method="ivf", nlists=8)
    # size 1 — under the floor: exact no matter how selective the probe
    assert eng.explain_route("c_ivf", n_rows=50_000, nprobe=1)["route"] == "exact"
    # size 2 — big table: selective probe wins, full probe loses
    assert eng.explain_route("c_ivf", n_rows=5_000_000, nprobe=1)["route"] == "ivf"
    assert eng.explain_route("c_ivf", n_rows=5_000_000, nprobe=8)["route"] == "exact"

    eng.create_index("c_hnsw", emb, "embedding", method="hnsw",
                     id_col="vec_id", num_shards=2, m=8, ef_construction=48)
    assert eng.explain_route("c_hnsw", n_rows=5_000_000,
                             ef_search=64)["route"] == "hnsw"
    # an ef that implies more beam work than the whole scan routes exact
    assert eng.explain_route("c_hnsw", n_rows=150_000,
                             ef_search=100_000)["route"] == "exact"

    eng.set_config("route.mode", "exact")
    try:
        assert eng.explain_route("c_ivf", n_rows=5_000_000,
                                 nprobe=1)["route"] == "exact"
        eng.set_config("route.mode", "index")
        assert eng.explain_route("c_ivf", n_rows=100,
                                 nprobe=8)["route"] == "ivf"
    finally:
        eng.set_config("route.mode", "auto")


def test_engine_cdc_ingest_ivf(spark):
    """cdc_ingest drains an ops source into a registered IVF index via
    the journaled foreachBatch path; catalog row count refreshes; a
    full-probe search sees inserts and respects deletes."""
    from pyspark.sql import types as T

    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.registry.common import qvec

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="engine_cdc_"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    eng.create_index(
        "cdc_ivf", emb.where(F.col("vec_id") % 2 == 0), "embedding",
        method="ivf", nlists=4, dim=64,
    )
    emb_type = {f.name: f.dataType for f in emb.schema.fields}["embedding"]
    src = tempfile.mkdtemp(prefix="engine_cdc_src_")
    ins = emb.where(F.col("vec_id") % 2 == 1).withColumn("op", F.lit("i"))
    dels = emb.where(F.col("vec_id") % 31 == 0).select(
        "vec_id", F.lit(None).cast(emb_type).alias("embedding"),
        F.lit("d").alias("op"),
    )
    ins.select("vec_id", "embedding", "op").unionByName(dels).repartition(
        2
    ).write.mode("overwrite").parquet(src)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", emb_type),
        T.StructField("op", T.StringType()),
    ])
    idx = eng.cdc_ingest("cdc_ivf", src, schema)
    assert eng.catalog.get("indexes", "cdc_ivf")["rows"] == emb.count()
    q = qvec(spark, SF_DIR, 3)
    got = [r["vec_id"] for r in idx.search(
        spark, q, k=5, nprobe=4, tiebreak=["vec_id"]).collect()]
    want = [r["vec_id"] for r in emb.where(F.col("vec_id") % 31 != 0).select(
        "vec_id",
        F.sqrt(F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"),
                       F.lit(q).cast("array<double>"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)).alias("d"),
    ).orderBy(F.col("d").asc(), F.col("vec_id").asc()).limit(5).collect()]
    assert got == want
