"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship scheduler-law query at sf0.001;
``queries``/``oracle_sql`` expose one pair per implemented operator class
from SURVEY.md §2 plus the training-data pipeline ops, each checked against
DuckDB at sf0.01 (row count + schema + order-insensitive value hash).

Numeric-stability conventions (cross-engine exactness): money sums are
computed in integer cents (``CAST(ROUND(x*100) AS BIGINT)``), quantities as
BIGINT, and float columns are excluded from outputs, so value hashes are
bit-deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Crawl-engine operator classes over the harness tables (SURVEY §2.K)
# ---------------------------------------------------------------------------

def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheduler law F3/F5: top-k-per-queue via the composite-key window
    (class_key ≙ customer, (directive, cost, ordinal) ≙ (priority, -price,
    orderkey))."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderpriority").asc(), F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc())
    return (o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_orderpriority",
                    _cents(F.col("o_totalprice")).alias("price_cents"),
                    "rn"))


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UriUniqFilter U1: candidates (customers) minus seen (recent order
    refs) — predicate keeps the anti-join non-degenerate at small SF."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return (c.join(o.select(F.col("o_custkey").alias("c_custkey")),
                   "c_custkey", "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


def q_budget_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue budget/metrics aggregation (F6/O4; TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
        F.count("*").alias("n_rows"))
        .orderBy("l_returnflag", "l_linestatus"))


def q_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort/limit (highest-priority head-of-frontier pick)."""
    o = _t(spark, sf_dir, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(10)
            .select("o_orderkey", "o_custkey",
                    _cents(F.col("o_totalprice")).alias("price_cents")))


def q_host_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join (host_state/robots ≙ nation/customer)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(_cents(F.sum("o_totalprice")).alias("revenue_cents"),
                 F.count("*").alias("n_orders"))
            .orderBy("n_name"))


def q_politeness_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate vs a per-key anchor (wake_ts ≤ now analog): orders
    within 30 days of each customer's first order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (o.withColumn("first_dt", F.min("o_orderdate").over(w))
            .where(F.col("o_orderdate")
                   <= F.col("first_dt") + F.expr("INTERVAL 30 DAYS"))
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_first30"))
            .orderBy("o_custkey"))


def q_running_expenditure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst running sums (F5 in-burst virtual-time accounting)."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("run_cents"))


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (candidate ∖ seen as EXCEPT)."""
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("key"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"))
    return p.distinct().exceptAll(s.distinct()).orderBy("key")


def q_quota_enforcer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuotaEnforcer P3: keys over a cumulative-usage quota (HAVING)."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    return g.where(F.col("total_qty") > 3000).orderBy("l_suppkey")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-epoch sessionization (30-min gap sessions per user)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    e = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    e = e.withColumn("session_id", F.sum("new_s").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)))
    return (e.groupBy("user_id")
            .agg(F.max("session_id").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))


def q_hop_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-type tallies (Link X3 / StatisticsTracker O4 shape)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .alias("n_click"),
        F.count_distinct("event_type").alias("n_types"))
        .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Training-data pipeline ops (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest (keeper = min id)."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy(F.md5("text").alias("digest"))
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keeper"))
            .orderBy("digest"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level MinHash (2 permutations via salted md5) per document."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != "")
    return (words.groupBy("doc_id").agg(
        F.min(F.md5(F.concat(F.lit("1"), F.col("w")))).alias("mh1"),
        F.min(F.md5(F.concat(F.lit("2"), F.col("w")))).alias("mh2"))
        .orderBy("doc_id"))


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: bucket by minhash band, report collision groups."""
    sigs = q_minhash_signatures(spark, sf_dir)
    return (sigs.groupBy(F.substring("mh1", 1, 8).alias("band"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc"))
            .orderBy("band"))


def q_ngram_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the normalized head (C3-style chain)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.substring("text", 1, 64)),
                            "[^a-z]", "")
    return d.select("doc_id", F.md5(norm).alias("fp")).orderBy("doc_id")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (integer-exact)."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "),
                     lambda x: x != F.lit(""))
    n_tok = F.size(words)
    return d.select(
        "doc_id", n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        (F.when(n_tok > 60, 2).otherwise(1)
         + F.when(F.length("text") > 300, 1).otherwise(0))
        .cast("long").alias("quality_score")).orderBy("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (integer counts only)."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "),
                     lambda x: x != F.lit(""))
    stops = F.filter(words, lambda x: x.isin("the", "and", "of", "to",
                                             "a", "in"))
    return d.select(
        "doc_id", F.size(words).alias("n_words"),
        F.size(stops).alias("n_stop"),
        F.when(F.size(stops) * 20 >= F.size(words), F.lit("en"))
        .otherwise(F.lit("other")).alias("lang_guess")).orderBy("doc_id")


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs query vector (vec_id=0), JVM-side
    zip_with/aggregate dot product in float64."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"))
    x = e.crossJoin(F.broadcast(qv))
    dot = F.aggregate(
        F.zip_with("embedding", "qv",
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    cos = dot / (nrm(F.col("embedding")) * nrm(F.col("qv")))
    return (x.where(F.col("vec_id") != 0)
            .select("vec_id", "label", cos.alias("_cos"))
            .orderBy(F.col("_cos").desc(), F.col("vec_id"))
            .limit(5).select("vec_id", "label"))


def q_label_centroids_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse partition stats: per label (≙ coarse centroid
    cell), member count — the bucketing side of an IVF index."""
    e = _t(spark, sf_dir, "embeddings")
    return (e.groupBy("label").agg(F.count("*").alias("n_members"),
                                   F.min("vec_id").alias("min_vec"))
            .orderBy("label"))


# ---------------------------------------------------------------------------
# Driver surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the scheduler-law window query at sf0.001."""
    return q_frontier_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_schedule": q_frontier_schedule,
        "seen_anti_join": q_seen_anti_join,
        "budget_sums": q_budget_sums,
        "priority_topk": q_priority_topk,
        "host_dim_join": q_host_dim_join,
        "politeness_window": q_politeness_window,
        "running_expenditure": q_running_expenditure,
        "set_except": q_set_except,
        "quota_enforcer": q_quota_enforcer,
        "sessionize": q_sessionize,
        "hop_type_counts": q_hop_type_counts,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_buckets": q_lsh_buckets,
        "ngram_fingerprint": q_ngram_fingerprint,
        "token_stats": q_token_stats,
        "lang_id": q_lang_id,
        "knn_brute": q_knn_brute,
        "label_centroids_topk": q_label_centroids_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "frontier_schedule": """
            SELECT o_custkey, o_orderkey, o_orderpriority,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents, rn
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderpriority ASC, o_totalprice DESC,
                                  o_orderkey ASC) AS rn
                  FROM orders)
            WHERE rn <= 3
        """,
        "seen_anti_join": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        """,
        "budget_sums": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "priority_topk": """
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "host_dim_join": """
            SELECT n_name,
                   CAST(ROUND(SUM(o_totalprice)*100) AS BIGINT)
                       AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "politeness_window": """
            SELECT o_custkey, COUNT(*) AS n_first30
            FROM (SELECT o_custkey, o_orderdate,
                         MIN(o_orderdate) OVER (PARTITION BY o_custkey)
                             AS first_dt
                  FROM orders)
            WHERE o_orderdate <= first_dt + INTERVAL 30 DAY
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "running_expenditure": """
            SELECT o_custkey, o_orderkey,
                   CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS run_cents
            FROM orders
        """,
        "set_except": """
            SELECT key FROM (
              SELECT DISTINCT p_partkey AS key FROM part
              EXCEPT
              SELECT DISTINCT s_suppkey AS key FROM supplier
            ) ORDER BY key
        """,
        "quota_enforcer": """
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty
            FROM lineitem GROUP BY l_suppkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 3000
            ORDER BY l_suppkey
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id
                                       ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id,
                     SUM(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
              FROM g)
            SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        "hop_type_counts": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_click,
                   COUNT(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS digest, COUNT(*) AS n_dups,
                   MIN(doc_id) AS keeper
            FROM documents GROUP BY md5(text) ORDER BY digest
        """,
        "minhash_signatures": """
            SELECT doc_id, MIN(md5('1' || w)) AS mh1,
                   MIN(md5('2' || w)) AS mh2
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w <> '' GROUP BY doc_id ORDER BY doc_id
        """,
        "lsh_buckets": """
            WITH sigs AS (
              SELECT doc_id, MIN(md5('1' || w)) AS mh1
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents)
              WHERE w <> '' GROUP BY doc_id)
            SELECT substr(mh1, 1, 8) AS band, COUNT(*) AS n_docs,
                   MIN(doc_id) AS min_doc
            FROM sigs GROUP BY substr(mh1, 1, 8) ORDER BY band
        """,
        "ngram_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(substr(text, 1, 64)),
                                      '[^a-z]', '', 'g')) AS fp
            FROM documents ORDER BY doc_id
        """,
        "token_stats": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS n_tokens,
                   length(text) AS n_chars_computed,
                   CAST(CASE WHEN len(list_filter(string_split(text, ' '),
                                                  x -> x <> '')) > 60
                             THEN 2 ELSE 1 END
                        + CASE WHEN length(text) > 300 THEN 1 ELSE 0 END
                        AS BIGINT) AS quality_score
            FROM documents ORDER BY doc_id
        """,
        "lang_id": """
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS n_words,
                     len(list_filter(string_split(text, ' '),
                         x -> list_contains(['the','and','of','to','a','in'],
                                            x))) AS n_stop
              FROM documents)
            SELECT doc_id, n_words, n_stop,
                   CASE WHEN n_stop * 20 >= n_words THEN 'en'
                        ELSE 'other' END AS lang_guess
            FROM t ORDER BY doc_id
        """,
        "knn_brute": """
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id, label
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(
                list_transform(embedding, x -> CAST(x AS DOUBLE)),
                list_transform(qv, x -> CAST(x AS DOUBLE))) DESC, vec_id
            LIMIT 5
        """,
        "label_centroids_topk": """
            SELECT label, COUNT(*) AS n_members, MIN(vec_id) AS min_vec
            FROM embeddings GROUP BY label ORDER BY label
        """,
    }
