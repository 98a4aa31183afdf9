"""Ops/tenancy, data-tiering, multimodal-metadata and remaining-ML gate
queries (SURVEY §2.5/§2.8/§2.11/§2.12).

Makes the last pytest-only families driver-visible: RLS + quota
enforcement (ops.py), hot/cold tiering with int8-quantized cold storage
(data_management.py), typed media metadata + video frame sampling
(operators/multimodal.py), distributed PCA (ml/pca.py), rows-only rows
for MLlib GMM and ALS, and (r7) the hash-gated exact fixed-alternation
ALS twin `als_fixed_alternations`.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.registry.common import events, t

PCA_DIM = 8  # leading slice of the 64-dim embedding (oracle SQL is O(dim²))
PCA_ITERS = 12


# ---------------------------------------------------------------------------
# rls_quota_usage — §2.12 tenancy (ops.py: tenant_view + QuotaManager)

def _q_rls_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLS + quota enforcement as data (neurondb_check_quota /
    get_quota_usage, neurondb--1.0.sql:2999-3019): tenant = user bucket,
    ``tenant_view`` pre-filters to tenant 3 (the predicate reaches the
    scan — Catalyst pushdown is the RLS enforcement at scale), usage is a
    distributed aggregate, and the quota verdict is a plain expression.
    The driver-side QuotaManager counters are the control-plane twin of
    this data-plane report (pytest-covered)."""
    from neurondb_spark.functions.aggregates import dsum
    from neurondb_spark.ops import tenant_view

    ev = events(spark, sf_dir).withColumn("tenant_id", F.col("user_id") % 8)
    v = tenant_view(ev, "tenant_id", 3)
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "event_type",
            "n_events",
            "total_value",
            F.when(F.col("n_events") > 400, F.lit("over"))
            .otherwise(F.lit("ok"))
            .alias("quota_status"),
        )
    )


_SQL_RLS_QUOTA = f"""SELECT event_type, COUNT(*) AS n_events,
       {O.dsum('value')} AS total_value,
       CASE WHEN COUNT(*) > 400 THEN 'over' ELSE 'ok' END AS quota_status
FROM events WHERE user_id % 8 = 3
GROUP BY event_type"""


# ---------------------------------------------------------------------------
# tier_cold_report — §2.11 data management (data_management.py: tier_cold)

_TIER_CUTOFF = "2025-02-20 00:00:00"


def _q_tier_cold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold tiering under the VALUE gate: rows age by a deterministic
    synthetic timestamp, ``tier_cold`` splits at the cutoff and re-encodes
    cold vectors as int8+scale (≈4× smaller — the reference's cold-tier
    compression, quantization.c:67-71). The checksum is computed from the
    POST-SPLIT frames (hot from full floats, cold from the quantized
    payload), so a row landing in the wrong tier or a corrupted re-encode
    breaks the hash."""
    from neurondb_spark.data_management import tier_cold
    from neurondb_spark.functions.aggregates import dsum

    emb = t(spark, sf_dir, "embeddings").withColumn(
        "ts",
        F.expr("CAST(date_add(DATE'2025-01-01', CAST(vec_id % 100 AS INT)) AS TIMESTAMP)"),
    )
    hot, cold = tier_cold(emb, "embedding", "ts", _TIER_CUTOFF)
    h = hot.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.element_at("embedding", 1).cast("double")).alias("checksum"),
    ).select(F.lit("hot").alias("tier"), "n_rows", "checksum", F.lit(0.0).alias("scale_sum"))
    c = cold.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.element_at("vec_int8", 1).cast("double")).alias("checksum"),
        dsum("vec_scale").alias("scale_sum"),
    ).select(F.lit("cold").alias("tier"), "n_rows", "checksum", "scale_sum")
    return h.unionByName(c)


def _sql_tier_cold() -> str:
    from neurondb_spark.registry.common import EMB_DIM

    absmax = ", ".join(f"abs({O.elem('embedding', i)})" for i in range(1, EMB_DIM + 1))
    scale = (
        f"(CASE WHEN greatest({absmax}) = 0.0 THEN 1.0 "
        f"ELSE 127.0 / greatest({absmax}) END)"
    )
    e1 = O.elem("embedding", 1)
    q1 = f"CAST(CAST(trunc(least(greatest(({e1}) * s, -127.0), 127.0)) AS INTEGER) AS DOUBLE)"
    return f"""WITH base AS (
  SELECT vec_id, embedding,
         CAST(DATE '2025-01-01' + CAST(vec_id % 100 AS INTEGER) AS TIMESTAMP) AS ts
  FROM embeddings),
hot AS (
  SELECT 'hot' AS tier, COUNT(*) AS n_rows,
         {O.dsum(e1)} AS checksum, 0.0 AS scale_sum
  FROM base WHERE ts >= TIMESTAMP '{_TIER_CUTOFF}'),
coldq AS (
  SELECT {scale} AS s, embedding FROM base WHERE ts < TIMESTAMP '{_TIER_CUTOFF}'),
cold AS (
  SELECT 'cold' AS tier, COUNT(*) AS n_rows,
         {O.dsum(q1)} AS checksum, {O.dsum('s')} AS scale_sum
  FROM coldq)
SELECT * FROM hot UNION ALL SELECT * FROM cold"""


# ---------------------------------------------------------------------------
# media_meta_stats — §2.5 multimodal typed-metadata surface

def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MEDIA_SCHEMA-shaped frame from documents: binary
    payload + typed meta struct (width/height/format/duration_ms). ASCII
    rows only so byte lengths equal codepoint lengths on both engines."""
    docs = t(spark, sf_dir, "documents").where(
        F.octet_length("text") == F.length("text")
    )
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("wav"))
        .otherwise(F.lit("mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 480 + 1).cast("int").alias("height"),
            fmt.alias("format"),
            F.when(F.col("doc_id") % 3 != 0, (F.col("n_chars") * 3).cast("int"))
            .alias("duration_ms"),
        ).alias("meta"),
    )


def _q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media metadata rollup (MEDIA_SCHEMA, operators/multimodal.py):
    per kind/format — count, total payload bytes (binary column), mean
    width from the meta struct, total duration. Proves the opaque-binary +
    typed-metadata data model end to end; payload decode is the
    cross_modal_search / video_frame_pixels rows."""
    m = _media_table(spark, sf_dir)
    return m.groupBy("kind", F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).alias("total_bytes"),
        (F.sum(F.col("meta.width").cast("long")).cast("double") / F.count(F.lit(1))).alias("avg_width"),
        F.sum(F.coalesce(F.col("meta.duration_ms").cast("long"), F.lit(0))).alias("total_duration_ms"),
    )


_SQL_MEDIA_META = """WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
         length(text) AS nbytes,
         CAST(n_chars % 640 + 1 AS INTEGER) AS width,
         CASE WHEN doc_id % 3 <> 0 THEN CAST(n_chars * 3 AS INTEGER) END AS duration_ms
  FROM documents
  WHERE octet_length(CAST(text AS BLOB)) = length(text))
SELECT kind, format, COUNT(*) AS n_media,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(SUM(CAST(width AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_width,
       CAST(SUM(COALESCE(CAST(duration_ms AS BIGINT), 0)) AS BIGINT)
         AS total_duration_ms
FROM m GROUP BY kind, format"""


# ---------------------------------------------------------------------------
# video_frame_pixels — §2.5 multimodal frame sampling (mapInPandas path)

def _q_frame_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing under the hash gate: binary payloads →
    ``frame_sample`` (mapInPandas, frame-seeded deterministic stub decode,
    one row in → n_frames×8 pixels out) → scalar probes of three pixels.
    The oracle replays the djb2 chain per frame, so the Arrow batch path
    and the frame seeding are both value-checked; a real ffmpeg sampler
    swaps in behind decode="strict" without plan changes."""
    from neurondb_spark.operators.multimodal import frame_sample

    docs = t(spark, sf_dir, "documents").where(
        (F.octet_length("text") == F.length("text")) & (F.col("doc_id") % 17 == 0)
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content")
    )
    fs = frame_sample(media, n_frames=2)
    f = F.col("frames")
    return fs.select(
        "media_id",
        F.element_at(F.element_at(f, 1), 1).cast("double").alias("f0_p0"),
        F.element_at(F.element_at(f, 1), 8).cast("double").alias("f0_p7"),
        F.element_at(F.element_at(f, 2), 1).cast("double").alias("f1_p0"),
    )


def _frame_px_sql(frame: int, upto: int) -> str:
    """Pixel ``upto`` (0-based) of frame ``frame``: djb2 over
    utf-8-bytes(text) + byte(frame), then ``upto``+1 mix steps; float32
    rounding matches the UDF's array<float> output."""
    chars = (
        "list_transform(generate_series(1, length(text)), "
        "i -> ascii(substr(text, i, 1)))"
    )
    seeded = f"list_append({chars}, {frame})"
    cur = (
        f"list_reduce(list_prepend(CAST(5381 AS BIGINT), {seeded}), "
        f"(h, c) -> xor(h * 33, c) % 4294967296)"
    )
    for i in range(upto + 1):
        cur = f"(xor(({cur}) * 33, {i}) % 4294967296)"
    return f"CAST(CAST(CAST(({cur}) % 256 AS DOUBLE) / 255.0 AS REAL) AS DOUBLE)"


def _sql_frame_pixels() -> str:
    return f"""SELECT doc_id AS media_id,
       {_frame_px_sql(0, 0)} AS f0_p0,
       {_frame_px_sql(0, 7)} AS f0_p7,
       {_frame_px_sql(1, 0)} AS f1_p0
FROM documents
WHERE octet_length(CAST(text AS BLOB)) = length(text) AND doc_id % 17 = 0"""


# ---------------------------------------------------------------------------
# pca_top_component — §2.8 dimensionality reduction (ml/pca.py)

def _q_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA under the hash gate: one sufficient-statistics pass
    (45 decimal-exact sums, map-side combined), driver-side O(dim²) power
    iteration from a fixed axis, then the projection as a codegen'd
    expression over the scan. The oracle replays the identical
    double-precision sequence in an unrolled CTE chain — covariance,
    12 iterations, projection — so the component is proven bit-exact,
    not just "close"."""
    from neurondb_spark.ml.pca import pca_top_component

    emb = t(spark, sf_dir, "embeddings")
    _, proj = pca_top_component(emb, "embedding", PCA_DIM, n_iter=PCA_ITERS)
    return (
        emb.select("vec_id", proj.alias("pc1"))
        .orderBy(F.col("pc1").desc(), F.col("vec_id").asc())
        .limit(25)
    )


def _sql_pca_top() -> str:
    d = PCA_DIM

    def e(i: int, src: str = "embedding") -> str:
        return O.elem(src, i)

    stats = ["COUNT(*) AS n"]
    for i in range(1, d + 1):
        stats.append(f"{O.dsum(e(i))} AS s{i}")
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            stats.append(f"{O.dsum(f'({e(i)}) * ({e(j)})')} AS p{i}_{j}")
    cov = ["CAST(n AS DOUBLE) AS nd"]
    for i in range(1, d + 1):
        for j in range(1, d + 1):
            lo, hi = min(i, j), max(i, j)
            cov.append(
                f"(p{lo}_{hi} / CAST(n AS DOUBLE)) - "
                f"(s{i} / CAST(n AS DOUBLE)) * (s{j} / CAST(n AS DOUBLE)) AS c{i}_{j}"
            )
    parts = [
        f"WITH st AS (\n  SELECT {', '.join(stats)}\n  FROM embeddings)",
        f"cov AS (SELECT {', '.join(cov)} FROM st)",
        "i0 AS (SELECT "
        + ", ".join(f"{'1.0' if i == 1 else '0.0'} AS v{i}" for i in range(1, d + 1))
        + ")",
    ]
    prev = "i0"
    for k in range(1, PCA_ITERS + 1):
        ws = []
        for i in range(1, d + 1):
            acc = "0.0"
            for j in range(1, d + 1):
                acc = f"({acc} + c{i}_{j} * v{j})"
            ws.append(f"{acc} AS w{i}")
        parts.append(f"w{k} AS (SELECT {', '.join(ws)} FROM cov, {prev})")
        nrm = "0.0"
        for i in range(1, d + 1):
            nrm = f"({nrm} + w{i} * w{i})"
        parts.append(f"n{k} AS (SELECT *, sqrt({nrm}) AS nrm FROM w{k})")
        parts.append(
            f"i{k} AS (SELECT "
            + ", ".join(f"w{i} / nrm AS v{i}" for i in range(1, d + 1))
            + f" FROM n{k})"
        )
        prev = f"i{k}"
    proj = f"({e(1, 'emb.embedding')}) * v1"
    for i in range(2, d + 1):
        proj = f"({proj} + ({e(i, 'emb.embedding')}) * v{i})"
    return (
        ",\n".join(parts)
        + f"""
SELECT emb.vec_id, {proj} AS pc1
FROM embeddings emb CROSS JOIN {prev}
ORDER BY pc1 DESC, emb.vec_id ASC LIMIT 25"""
    )


# ---------------------------------------------------------------------------
# gmm_cluster_sizes / als_recommend_topk — rows-only MLlib rows (§2.8)

def _q_gmm_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib GaussianMixture through the unified train/predict API
    (ml/api.py; neurondb_train dispatch). Cluster ids are
    permutation-unstable across EM inits → rows-only by design (k rows;
    scalar columns only — canonicalizer-safe)."""
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine

    emb = t(spark, sf_dir, "embeddings")
    eng = MLEngine(Catalog(tempfile.mkdtemp(prefix="neurondb_gmm_")))
    mid = eng.train(
        emb, "gmm", ["embedding"],
        params={"k": 3, "seed": 42, "maxIter": 15},  # bounded EM: cluster
        # sizes stabilize long before MLlib's 100-iteration default
    )
    pred = eng.predict(emb, mid)
    return pred.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_als_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ALS (collaborative_filter in the unified API;
    ml_recommender.c ALS analog): implicit ratings from event counts,
    rank-4 factorization, top-3 recommendations exploded to scalar
    columns. Factor values are seed/partitioning-sensitive → rows-only
    (the row COUNT is deterministic: 3 per qualifying user)."""
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine

    ev = events(spark, sf_dir)
    ratings = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
        .withColumn("item_id", F.abs(F.hash("event_type")) % 1000)
    )
    eng = MLEngine(Catalog(tempfile.mkdtemp(prefix="neurondb_als_")))
    mid = eng.train(
        ratings, "collaborative_filter", features=[], target=None,
        params={
            "userCol": "user_id", "itemCol": "item_id", "ratingCol": "rating",
            "rank": 4, "seed": 42,
        },
    )
    model, _meta = eng._load(mid)
    # recommendForUserSubset, not recommendForAllUsers + filter: at scale
    # the top-k factor GEMM runs only for the requested users
    users = ratings.select("user_id").where(F.col("user_id") < 20).distinct()
    recs = model.recommendForUserSubset(users, 3)
    rec = F.explode("recommendations").alias("rec")
    return recs.select("user_id", rec).select(
        "user_id",
        F.col("rec.item_id").alias("item_id"),
        F.col("rec.rating").cast("double").alias("score"),
    )


def _q_als_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-alternation ALS under the hash gate (r6 verdict
    stretch #8 — the kmeans_fixed_lloyd playbook applied to ALS):
    rank-2 factorization of the implicit (user, event_type) count
    matrix with deterministic item init and three closed-form 2x2
    ridge solves (ml/stats.als_exact), then top-3 recommendations per
    user < 20 with (score DESC, item ASC) deterministic ranking. The
    DuckDB oracle replays init + all three alternations + the ranking;
    `als_recommend_topk` remains the rows-only MLlib production
    path."""
    from pyspark.sql.window import Window

    from neurondb_spark.ml.stats import als_exact

    ev = events(spark, sf_dir)
    ratings = ev.groupBy(
        "user_id", F.col("event_type").alias("item")
    ).agg(F.count(F.lit(1)).cast("double").alias("rating"))
    p, q = als_exact(ratings, "user_id", "item", "rating", lam=0.1)
    sc = (
        p.where(F.col("user_id") < 20)
        .crossJoin(F.broadcast(q))
        .select(
            "user_id", "item",
            (F.col("p1") * F.col("q1") + F.col("p2") * F.col("q2"))
            .alias("score"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item").asc()
    )
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "item", "score")
    )


def _sql_als_exact() -> str:
    lam = O.dlit(0.1)

    def solve(tag, src, fac, key, f1, f2):
        det = f"((a11 + {lam}) * (a22 + {lam}) - a12 * a12)"
        return f"""{tag}a AS (
  SELECT r.{key} AS k,
         {O.bsum(f'q.{f1} * q.{f1}')} AS a11,
         {O.bsum(f'q.{f1} * q.{f2}')} AS a12,
         {O.bsum(f'q.{f2} * q.{f2}')} AS a22,
         {O.bsum(f'q.{f1} * r.rating')} AS b1,
         {O.bsum(f'q.{f2} * r.rating')} AS b2
  FROM ratings r JOIN {fac} q ON r.{src} = q.{src}
  GROUP BY r.{key}),
{tag} AS (
  SELECT k AS {key},
         ((a22 + {lam}) * b1 - a12 * b2) / {det} AS p1,
         ((a11 + {lam}) * b2 - a12 * b1) / {det} AS p2
  FROM {tag}a)"""

    return f"""WITH ratings AS (
  SELECT user_id, event_type AS item, CAST(COUNT(*) AS DOUBLE) AS rating
  FROM events GROUP BY user_id, event_type),
q0 AS (
  SELECT DISTINCT item, CAST(1.0 AS DOUBLE) AS q1,
         CAST((CAST(('0x' || substr(md5(item), 1, 15)) AS BIGINT) % 1000)
              AS DOUBLE) / 1000.0 AS q2
  FROM ratings),
{solve('u1', 'item', 'q0', 'user_id', 'q1', 'q2')},
i1x AS (SELECT user_id, p1 AS q1, p2 AS q2 FROM u1),
{solve('i1', 'user_id', 'i1x', 'item', 'q1', 'q2')},
i1f AS (SELECT item, p1 AS q1, p2 AS q2 FROM i1),
{solve('u2', 'item', 'i1f', 'user_id', 'q1', 'q2')},
sc AS (
  SELECT p.user_id, i.item, p.p1 * i.q1 + p.p2 * i.q2 AS score
  FROM u2 p CROSS JOIN i1f i WHERE p.user_id < 20)
SELECT user_id, item, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY score DESC, item) AS rn
  FROM sc) WHERE rn <= 3"""


QUERIES = {
    "rls_quota_usage": (_q_rls_quota, _SQL_RLS_QUOTA),
    "als_fixed_alternations": (_q_als_exact, _sql_als_exact()),
    "tier_cold_report": (_q_tier_cold, _sql_tier_cold()),
    "media_meta_stats": (_q_media_meta, _SQL_MEDIA_META),
    "video_frame_pixels": (_q_frame_pixels, _sql_frame_pixels()),
    "pca_top_component": (_q_pca_top, _sql_pca_top()),
    "gmm_cluster_sizes": (_q_gmm_sizes, None),
    "als_recommend_topk": (_q_als_topk, None),
}
