"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (JVM-side ``zip_with`` /
``aggregate`` dot products — no Python per row); the scale paths are
random-hyperplane LSH bucketing and an IVF coarse index (centroid
assignment via a broadcast centroid table).  At 100 TB the brute path is a
single pruned scan + top-k per query (no shuffle of the corpus); the
LSH/IVF paths turn kNN into bucket-local joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute(df: DataFrame, query: DataFrame, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """Exact top-k per query vector: broadcast the (small) query set over
    the corpus and window-rank per query — corpus is scanned once, never
    shuffled by pair."""
    x = df.crossJoin(F.broadcast(query))
    scored = x.select(
        qid_col, id_col,
        cosine_expr(F.col(vec_col), F.col(qvec_col)).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplane_buckets(df: DataFrame, planes: DataFrame,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: sign bits vs broadcast plane vectors packed
    into one integer bucket key."""
    p = planes.select(F.col("plane_id"), F.col("plane_vec"))
    x = df.crossJoin(F.broadcast(p))
    bit = F.when(_dot(F.col(vec_col), F.col("plane_vec")) >= 0,
                 F.lit(1)).otherwise(F.lit(0))
    sb = x.select(id_col, "plane_id", bit.alias("bit"))
    # shiftleft with a column shift amount needs the SQL form (the Python
    # helper only takes a literal bit count)
    return sb.groupBy(id_col).agg(
        F.sum(F.expr("CAST(bit AS BIGINT) * shiftleft(1L, plane_id)"))
        .alias("bucket"))


def knn_lsh(df: DataFrame, query: DataFrame, planes: DataFrame,
            k: int = 10, id_col: str = "vec_id",
            vec_col: str = "embedding", qid_col: str = "q_id",
            qvec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket."""
    corpus_b = hyperplane_buckets(df, planes, id_col, vec_col).join(
        df, id_col)
    query_b = hyperplane_buckets(
        query.select(F.col(qid_col).alias(id_col),
                     F.col(qvec_col).alias(vec_col)),
        planes, id_col, vec_col).select(
        F.col(id_col).alias(qid_col), "bucket").join(
        query, qid_col)
    x = corpus_b.join(query_b, "bucket")
    scored = x.select(
        qid_col, id_col,
        cosine_expr(F.col(vec_col), F.col(qvec_col)).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_train(df: DataFrame, k: int = 16, iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Train IVF coarse centroids with Lloyd's iterations, fully as
    DataFrame ops: assign = broadcast-centroid argmax (ivf_assign), update
    = per-(cell, dimension) mean via posexplode + groupBy — no vectors
    ever collect to the driver; the centroid table (k × dim doubles) is
    the only small state, localCheckpointed per iteration to bound plan
    depth.  Deterministic: seeds are the first k vectors by id."""
    w = Window.orderBy(id_col)
    cent = (df.orderBy(id_col).limit(k)
            .withColumn("cell_id", F.row_number().over(w) - 1)
            .select("cell_id",
                    F.transform(F.col(vec_col),
                                lambda x: x.cast("double"))
                    .alias("centroid"))
            .localCheckpoint())
    for _ in range(iters):
        assigned = ivf_assign(df, cent, id_col, vec_col)
        dims = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "v"))
        means = (dims.groupBy("cell", "pos")
                 .agg(F.avg(F.col("v").cast("double")).alias("m")))
        cent = (means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("centroid"))
            .select(F.col("cell").alias("cell_id"), "centroid")
            .localCheckpoint())
    return cent


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: nearest broadcast centroid per vector.
    Writing the corpus partitioned by ``cell`` turns later queries into
    partition-pruned scans of ``nprobe`` cells."""
    x = df.crossJoin(F.broadcast(
        centroids.select("cell_id", "centroid")))
    d = cosine_expr(F.col(vec_col), F.col("centroid"))
    w = Window.partitionBy(id_col).orderBy(F.desc(d))
    return (x.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(id_col, vec_col, F.col("cell_id").alias("cell")))


def knn_ivf(df: DataFrame, query: DataFrame, centroids: DataFrame,
            k: int = 10, nprobe: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding", qid_col: str = "q_id",
            qvec_col: str = "q_vec") -> DataFrame:
    """IVF search: scan only the nprobe closest cells per query."""
    corpus = ivf_assign(df, centroids, id_col, vec_col)
    qx = query.crossJoin(F.broadcast(
        centroids.select("cell_id", "centroid")))
    qd = cosine_expr(F.col(qvec_col), F.col("centroid"))
    wq = Window.partitionBy(qid_col).orderBy(F.desc(qd))
    probes = (qx.withColumn("_rk", F.row_number().over(wq))
              .where(F.col("_rk") <= nprobe)
              .select(qid_col, qvec_col, F.col("cell_id").alias("cell")))
    x = corpus.join(probes, "cell")
    scored = x.select(
        qid_col, id_col,
        cosine_expr(F.col(vec_col), F.col(qvec_col)).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def axis_planes(spark, dims: list[int], vec_len: int) -> DataFrame:
    """Axis-aligned hyperplanes (unit basis vectors e_i): the degenerate —
    and fully SQL-expressible — instance of random-hyperplane LSH, where
    the sign bit of plane i is simply ``sign(vec[dims[i]])``.  Used by the
    driver-gate query so the DuckDB oracle can reproduce the bucketing
    exactly; production callers pass genuinely random planes."""
    rows = [(i, [1.0 if j == d else 0.0 for j in range(vec_len)])
            for i, d in enumerate(dims)]
    return spark.createDataFrame(rows, "plane_id int, plane_vec array<double>")


def embedding_near_dups(df: DataFrame, planes: DataFrame,
                        threshold: float = 0.9,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_bucket: int | None = 2000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale.

    Hyperplane-LSH bucket self-join — NEVER all-pairs: two vectors are
    compared only when every sign bit agrees (one bucket key), so the
    shuffle is keyed on the bucket and the pair blow-up is bounded by
    ``cap_buckets`` (same non-silent cap contract as the MinHash/SimHash
    paths).  Survivors get an exact JVM-side cosine verify; output is the
    (id_a < id_b) pair list with the verified cosine.

    Recall tuning is the plane count: k planes ⇒ a near-dup pair at angle
    θ survives with probability (1-θ/π)^k; run multiple independent plane
    sets and union for higher recall (each set is one cheap pass).
    """
    from .dedup import cap_buckets

    b = (hyperplane_buckets(df, planes, id_col, vec_col)
         .join(df.select(id_col, vec_col), id_col))
    b = cap_buckets(b, ["bucket"], id_col, max_bucket)
    left = b.select(F.col(id_col).alias("id_a"), "bucket",
                    F.col(vec_col).alias("_va"))
    right = b.select(F.col(id_col).alias("id_b"), "bucket",
                     F.col(vec_col).alias("_vb"))
    return (left.join(right, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    cosine_expr(F.col("_va"), F.col("_vb")).alias("cosine"))
            .where(F.col("cosine") >= threshold))
