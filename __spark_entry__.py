"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship scheduler-law query at sf0.001;
``queries``/``oracle_sql`` expose one pair per implemented operator class
from SURVEY.md §2 plus the training-data pipeline ops, each checked against
DuckDB at sf0.01 (row count + schema + order-insensitive value hash).

The entries exercise the SHIPPED ``heritrix_spark`` modules (scheduler
window, seen filter, canonicalizer, SURT, scope fold, cost policies,
robots matcher, dedup/text/similarity pipelines) — the DuckDB oracle
certifies the product, not a re-implementation.  Where a module defaults
to ``xxhash64`` (which DuckDB lacks) the module's pluggable ``hash_fn``
runs with md5 so both engines compute the identical function; the hash is
a parameter of the algorithm, not its substance.

Numeric-stability conventions (cross-engine exactness): money sums are
computed in integer cents (``CAST(ROUND(x*100) AS BIGINT)``), quantities
and scores as BIGINT/INT (all SUM-typed oracle columns CAST to BIGINT —
DuckDB SUM returns HUGEINT), and float columns are excluded from outputs,
so value hashes are bit-deterministic in both engines.
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


def _md5_32(c):
    """md5 → 32-bit unsigned int — the cross-engine numeric hash_fn."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Crawl-engine operator classes over the harness tables (SURVEY §2.K)
# ---------------------------------------------------------------------------

def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheduler law F3/F5 via the engine's salted top-k-per-queue window
    (operators.schedule.top_k_per_queue — the same operator CrawlJob's
    burst selection runs): class_key ≙ customer, (directive, cost,
    ordinal) ≙ (priority, -price, orderkey)."""
    from heritrix_spark.operators.schedule import top_k_per_queue
    o = _t(spark, sf_dir, "orders")
    return (top_k_per_queue(
                o, ["o_custkey"],
                [F.col("o_orderpriority").asc(),
                 F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
                3, rank_col="rn", salt_col="o_orderkey", salt_count=8)
            .select("o_custkey", "o_orderkey", "o_orderpriority",
                    _cents(F.col("o_totalprice")).alias("price_cents"),
                    "rn"))


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UriUniqFilter U1 via operators.uniq.SeenFilter: candidates
    (customers) minus seen (recent order refs)."""
    from heritrix_spark.operators.uniq import SeenFilter
    c = _t(spark, sf_dir, "customer")
    seen = (_t(spark, sf_dir, "orders")
            .where(F.col("o_orderdate")
                   >= F.lit("1998-01-01").cast("timestamp"))
            .select(F.col("o_custkey").alias("c_custkey")))
    f = SeenFilter(spark, seen=seen)
    return (f.filter_unseen(c, canon_col="c_custkey")
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


def q_first_arrival_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MemUriUniqFilter U4 via operators.uniq.dedup_first_arrival: first
    event per (user, event_type) in arrival order."""
    from heritrix_spark.operators.uniq import dedup_first_arrival
    e = _t(spark, sf_dir, "events").withColumn(
        "_k", F.concat_ws(":", F.col("user_id").cast("string"),
                          F.col("event_type")))
    return (dedup_first_arrival(e, ["ts", "event_id"], canon_col="_k")
            .select("user_id", "event_type", "event_id")
            .orderBy("user_id", "event_type"))


def q_queue_assign_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 SurtAuthorityQueueAssignmentPolicy + scheduler law: URLs keyed
    by SURT authority (functions.queue_assign.queue_key_expr — the same
    policy expr CrawlJob's candidate pipeline uses when
    queue_assignment='surt'), then the engine's salted top-k window."""
    from heritrix_spark.functions.queue_assign import queue_key_expr
    from heritrix_spark.operators.schedule import top_k_per_queue
    d = _doc_ids(spark, sf_dir)
    url = F.concat(F.lit("http://h"),
                   (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/p/"),
                   F.col("doc_id").cast("string"))
    d = d.withColumn("class_key", queue_key_expr(url, "surt"))
    return (top_k_per_queue(d, ["class_key"], [F.col("doc_id").asc()], 5,
                            rank_col="rn", salt_col="doc_id",
                            salt_count=4)
            .select("doc_id", "class_key", "rn")
            .orderBy("doc_id"))


def q_quota_bytes_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 byte-quota law shape: the pre-quota running sum over the same
    per-key window the engine's mid-burst check uses (usage accrued
    BEFORE each row decides whether the row is blocked)."""
    li = _t(spark, sf_dir, "lineitem")
    # The synthetic lineitem carries duplicate (orderkey, linenumber)
    # keys; quantity+price tiebreakers make the running sum a total
    # order so both engines compute the identical prefix sums.
    w = (Window.partitionBy("l_suppkey")
         .orderBy("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(
        F.sum(F.col("l_quantity").cast("long")).over(w), F.lit(0))
    return (li.select("l_suppkey", "l_orderkey", "l_linenumber",
                      prior.alias("prior_qty"),
                      (prior >= 3000).alias("blocked"))
            .orderBy("l_suppkey", "l_orderkey", "l_linenumber",
                     "prior_qty"))


# ---------------------------------------------------------------------------
# URL-layer functions (canonicalizer C1-C3, SURT C4, classKey F7,
# cost F9-F12, hops X3, scope fold S1-S9, robots R2) — messy inputs are
# synthesized deterministically from doc_id; the DuckDB oracle states the
# expected output in closed form (an independent derivation of the same
# template, not a port of the regex chain).
# ---------------------------------------------------------------------------

def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select("doc_id")


def q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizer chain end-to-end (userinfo, www, default port,
    jsessionid path param, session query params, &&, trailing ?/&,
    fragment, dot segments)."""
    from heritrix_spark.functions.canonicalize import canonicalize_expr
    d = _doc_ids(spark, sf_dir)
    ds = F.col("doc_id").cast("string")
    messy = F.concat(
        F.lit("http://user@WWW.h"), (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.test:80/a/./b/../p/"), ds,
        F.lit(";jsessionid=0123456789abcdefgh?sid=abc&x="), ds,
        F.lit("&&y=1&#frag"))
    return (d.select("doc_id",
                     canonicalize_expr(messy).alias("canon_url"))
            .orderBy("doc_id"))


def q_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT transform (label reversal + port + rest)."""
    from heritrix_spark.functions.surt import surt_expr
    d = _doc_ids(spark, sf_dir)
    ds = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".sub.example.org:8443/p/"), ds)
    return d.select("doc_id", surt_expr(url).alias("surt")).orderBy("doc_id")


def q_class_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HostnameQueueAssignmentPolicy F7: host + nonstandard port."""
    from heritrix_spark.functions.canonicalize import class_key_expr
    d = _doc_ids(spark, sf_dir)
    hs = F.concat(F.lit("h"), (F.col("doc_id") % 50).cast("string"),
                  F.lit(".example.test"))
    url = F.concat(
        F.lit("http://"), hs,
        F.when(F.col("doc_id") % 3 == 1, F.lit(":80"))
        .when(F.col("doc_id") % 3 == 2, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/x"))
    return (d.select("doc_id", class_key_expr(url).alias("class_key"))
            .orderBy("doc_id"))


def q_host_settings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 settings sheets: longest-suffix sheet resolution
    (settings_group_expr) + the effective politeness law under the
    resolved sheet (the same effective_settings dimension the crawl
    engine broadcasts).  [H: org/archive/crawler/settings/
    XMLSettingsHandler.java — per-domain refinement sheets]"""
    from heritrix_spark import config as C
    sheets = (
        ("h7.example.test", (("min_delay_ms", 750),
                             ("delay_factor", 1.0))),
        ("example.test", (("min_delay_ms", 6000),)),
        ("sub.example.test", (("delay_factor", 2.0),
                              ("max_delay_ms", 8000))),
    )
    cfg = C.CrawlConfig(host_settings=sheets)
    d = _doc_ids(spark, sf_dir)
    host = (
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit("h"), (F.col("doc_id") % 50).cast("string"),
                        F.lit(".other.test")))
        .when(F.col("doc_id") % 7 == 0,
              F.concat(F.lit("x"), (F.col("doc_id") % 9).cast("string"),
                       F.lit(".sub.example.test")))
        .otherwise(
            F.concat(F.lit("h"), (F.col("doc_id") % 50).cast("string"),
                     F.lit(".example.test"))))
    d = d.select("doc_id", host.alias("host"))
    d = d.withColumn("sgroup", C.settings_group_expr(cfg, F.col("host")))
    dims = F.broadcast(spark.createDataFrame(
        [(g, float(e["delay_factor"]), e["min_delay_ms"],
          e["max_delay_ms"])
         for g, e in ((g, C.effective_settings(cfg, g))
                      for g in range(len(sheets) + 1))],
        "sgroup int, dfactor double, mind int, maxd int"))
    d = d.join(dims, "sgroup")
    fetch_ms = (F.lit(500) * (1 + F.pmod(F.col("doc_id"), F.lit(4))))
    return d.select(
        "doc_id", "host", "sgroup",
        F.col("mind").alias("eff_min_delay_ms"),
        F.least(F.greatest(F.col("dfactor") * fetch_ms,
                           F.col("mind").cast("double")),
                F.col("maxd").cast("double"))
        .cast("long").alias("politeness_ms")).orderBy("doc_id")


def q_cost_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wag + AntiCalendar cost policies F11/F12 over path-depth, query
    and calendar-trap variation."""
    from heritrix_spark.functions.cost import (
        anticalendar_cost_expr,
        wag_cost_expr,
    )
    d = _doc_ids(spark, sf_dir)
    ds = F.col("doc_id").cast("string")
    path = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit("/cal/2026/"), (1 + F.col("doc_id") % 12).cast("string"),
                 F.lit("/"), (1 + F.col("doc_id") % 28).cast("string"),
                 F.lit("/x"))
    ).otherwise(F.concat(F.lit("/p/"), (F.col("doc_id") % 9).cast("string"),
                         F.lit("/img"), ds))
    query = F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit("?q="),
                            F.repeat(F.lit("z"),
                                     (F.col("doc_id") % 40).cast("int")))
                   ).otherwise(F.lit(""))
    url = F.concat(F.lit("http://h.example.test"), path, query)
    return (d.select("doc_id",
                     wag_cost_expr(url).alias("wag_cost"),
                     anticalendar_cost_expr(url).alias("anticalendar_cost"))
            .orderBy("doc_id"))


def q_hop_path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pathFromSeed grammar X3: link-hop count + transclusion tail."""
    from heritrix_spark.functions.hops import link_hops_expr, trans_tail_expr
    d = _doc_ids(spark, sf_dir)
    hops = F.concat(
        F.repeat(F.lit("L"), (F.col("doc_id") % 5).cast("int")),
        F.repeat(F.lit("E"), (F.col("doc_id") % 3).cast("int")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("P")).otherwise(F.lit("")))
    return (d.select("doc_id",
                     link_hops_expr(hops).alias("n_link_hops"),
                     trans_tail_expr(hops).alias("n_trans_tail"))
            .orderBy("doc_id"))


def q_scope_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecideRule fold S1-S9 (prereq-accept, hops, transclusion tail,
    path depth, pathological path) via operators.scope.scope_accepts_expr."""
    from heritrix_spark.config import CrawlConfig
    from heritrix_spark.operators.scope import scope_accepts_expr
    cfg = CrawlConfig(max_link_hops=4, max_trans_hops=2,
                      max_path_segments=5, pathological_repeats=2)
    d = _doc_ids(spark, sf_dir)
    path = F.concat(
        F.substring(F.lit("/a/b/c/d/e/f/g/h"), 1,
                    (2 * (F.col("doc_id") % 8)).cast("int")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("/z/z/z"))
        .otherwise(F.lit("")))
    url = F.concat(F.lit("http://h.example.test"), path)
    hops = F.concat(
        F.repeat(F.lit("L"), (F.col("doc_id") % 7).cast("int")),
        F.repeat(F.lit("E"), (F.col("doc_id") % 4).cast("int")),
        F.when(F.col("doc_id") % 13 == 0, F.lit("P")).otherwise(F.lit("")))
    return (d.select("doc_id",
                     scope_accepts_expr(cfg, url, hops).alias("accepted"))
            .orderBy("doc_id"))


def q_postfetch_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 post-fetch decide rules — FetchStatusDecideRule +
    ContentTypeMatches/NotMatchesRegExpDecideRule + ContentLengthDecideRule
    as one conjunctive gate expression (operators/postfetch.py), evaluated
    over a synthesized per-doc fetch-result column set (status, mime,
    content-length)."""
    from heritrix_spark.operators.postfetch import gate_expr
    d = _doc_ids(spark, sf_dir)
    status = (F.when(F.col("doc_id") % 9 == 0, F.lit(404))
              .when(F.col("doc_id") % 9 == 1, F.lit(503))
              .otherwise(F.lit(200)))
    mime = F.concat(F.lit("image/"),
                    F.when(F.col("doc_id") % 2 == 0, F.lit("png"))
                    .otherwise(F.lit("jpeg")))
    nbytes = (F.lit(4096) * (F.lit(1) + F.pmod(F.col("doc_id"),
                                               F.lit(8)))).cast("long")
    extract_rules = {"status_in": [200], "mime_reject": "jpeg$"}
    write_rules = {"status_in": [200, 404], "mime_accept": "^image/",
                   "max_bytes": 4096 * 6}
    return (d.select(
        "doc_id",
        gate_expr(extract_rules, status, mime, nbytes).alias("extract_ok"),
        gate_expr(write_rules, status, mime, nbytes).alias("write_ok"))
        .orderBy("doc_id"))


def q_robots_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RobotsExclusionPolicy R2: longest-prefix Allow/Disallow verdict via
    operators.robots (rules_per_host + join_rules + disallowed_expr)."""
    from heritrix_spark.functions.canonicalize import path_expr
    from heritrix_spark.operators import robots as R
    rules = spark.createDataFrame(
        [("h.example.test", "/a", False, 0),
         ("h.example.test", "/a/b", True, 1),
         ("h.example.test", "/c", False, 2)],
        "host string, path_prefix string, allow boolean, rule_order int")
    d = _doc_ids(spark, sf_dir)
    path = (F.when(F.col("doc_id") % 5 == 0, F.lit("/a/x"))
            .when(F.col("doc_id") % 5 == 1, F.lit("/a/b/c"))
            .when(F.col("doc_id") % 5 == 2, F.lit("/c/z"))
            .when(F.col("doc_id") % 5 == 3, F.lit("/d"))
            .otherwise(F.lit("/robots.txt")))
    batch = d.select("doc_id",
                     F.lit("h.example.test").alias("host"),
                     F.concat(F.lit("http://h.example.test"), path)
                     .alias("url"))
    joined = R.join_rules(batch, R.rules_per_host(rules))
    return (joined.select(
        "doc_id",
        R.disallowed_expr(path_expr(F.col("url")),
                          F.col("robots_rules")).alias("disallowed"))
        .orderBy("doc_id"))


def _extract_fixture(spark: SparkSession, sf_dir: str,
                     content_col: str, content: F.Column,
                     via: F.Column) -> DataFrame:
    d = _doc_ids(spark, sf_dir)
    return d.select("doc_id", via.alias("url"),
                    F.lit("L").alias("hops_path"),
                    content.alias(content_col))


def q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorHTML X1 via operators.extract.outlinks_html (the real-HTML
    regex extractor): relative-href resolution against the page (or a
    <base href>), meta-robots-nofollow suppression of nav links,
    embed (src) and speculative (<script> literal) hops — all exercised
    over deterministically synthesized HTML.  The oracle states the
    expected link set in closed form."""
    from heritrix_spark.operators.extract import outlinks_html
    ds = F.col("doc_id").cast("string")
    base_tag = F.when(F.col("doc_id") % 5 == 0,
                      F.lit('<base href="http://cdn.example.test/b/">')
                      ).otherwise(F.lit(""))
    meta = F.when(F.col("doc_id") % 7 == 0,
                  F.lit('<meta name="robots" content="nofollow">')
                  ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), base_tag, meta, F.lit("</head><body>"),
        F.lit('<a href="a'), ds, F.lit('.html">x</a>'),
        F.lit('<img src="/i/img'), ds, F.lit('.png">'),
        F.lit('<script>fetch("http://api.example.test/v/'), ds,
        F.lit('")</script></body></html>'))
    via = F.concat(F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/d/"), ds, F.lit("/page.html"))
    fetched = _extract_fixture(spark, sf_dir, "html", html, via)
    return (outlinks_html(fetched)
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_extract_css(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorCSS X2 via operators.extract.outlinks_css: url(...) tokens
    (quoted and bare) + @import "..." rules, resolved against the
    stylesheet URL, hop type E."""
    from heritrix_spark.operators.extract import outlinks_css
    ds = F.col("doc_id").cast("string")
    css = F.concat(
        F.lit('body{background:url("/bg/b'), ds, F.lit('.png")} '),
        F.lit(".x{background:url(img"), ds, F.lit(".gif)} "),
        F.lit('@import "theme'), ds, F.lit('.css";'))
    via = F.concat(F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/css/style"), ds, F.lit(".css"))
    fetched = _extract_fixture(spark, sf_dir, "css", css, via)
    return (outlinks_css(fetched)
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_extract_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorJS X2 via operators.extract.outlinks_js: quoted absolute
    URLs inside script bodies, hop type X (speculative)."""
    from heritrix_spark.operators.extract import outlinks_js
    ds = F.col("doc_id").cast("string")
    js = F.concat(
        F.lit('var a="http://h'), (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.test/api/"), ds, F.lit('";'),
        F.lit("var b='x';fetch('https://img.example.test/t/"), ds,
        F.lit(".jpg');"))
    via = F.concat(F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/j/app"), ds, F.lit(".js"))
    fetched = _extract_fixture(spark, sf_dir, "js", js, via)
    return (outlinks_js(fetched)
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_extract_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorXML X2 via operators.extract.outlinks_xml: sitemap <loc>
    entries + feed href attributes, resolved against the sitemap URL,
    hop type L."""
    from heritrix_spark.operators.extract import outlinks_xml
    ds = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc> http://h"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.test/s/"), ds, F.lit(" </loc></url>"),
        F.lit('<link href="/feed/'), ds, F.lit('.atom"/></urlset>'))
    via = F.concat(F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/sitemap"), ds, F.lit(".xml"))
    fetched = _extract_fixture(spark, sf_dir, "xml", xml, via)
    return (outlinks_xml(fetched)
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_extract_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorURI X2 via operators.extract.outlinks_uri: http(s) URLs
    embedded in the URI's own query-string values — %-encoded (even
    doc_ids) and bare (doc_ids % 3 == 0) — hop type X (speculative)."""
    from heritrix_spark.operators.extract import outlinks_uri
    ds = F.col("doc_id").cast("string")
    enc = F.when(F.col("doc_id") % 2 == 0, F.concat(
        F.lit("u=http%3A%2F%2Fd"), ds,
        F.lit(".example.test%2Fp&"))).otherwise(F.lit(""))
    bare = F.when(F.col("doc_id") % 3 == 0, F.concat(
        F.lit("next=https://n"), ds,
        F.lit(".example.test/x&"))).otherwise(F.lit(""))
    via = F.concat(F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
                   F.lit(".example.test/go?"), enc, bare,
                   F.lit("k="), ds)
    d = _doc_ids(spark, sf_dir)
    fetched = d.select("doc_id", via.alias("url"),
                       F.lit("L").alias("hops_path"))
    return (outlinks_uri(fetched)
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_extract_implied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorImpliedURI X2 via operators.extract.outlinks_implied: the
    configured (trigger, build) rewrite /thumb/N_t.jpg -> /full/N.jpg,
    emitted only when the trigger matches (even doc_ids), hop type X."""
    from heritrix_spark.operators.extract import outlinks_implied
    ds = F.col("doc_id").cast("string")
    via = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.test"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("/thumb/"), ds, F.lit("_t.jpg")))
        .otherwise(F.concat(F.lit("/full/"), ds, F.lit(".jpg"))))
    d = _doc_ids(spark, sf_dir)
    fetched = d.select("doc_id", via.alias("url"),
                       F.lit("L").alias("hops_path"))
    return (outlinks_implied(fetched, trigger=r"/thumb/(\d+)_t\.jpg$",
                             build=r"/full/$1.jpg")
            .select("doc_id", "link_idx", "url", "hop", "hops_path")
            .orderBy("doc_id", "link_idx"))


def q_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaptiveRevisit F16 via plans.revisit.wait_schedule: the
    WaitEvaluator clamped multiplicative walk over synthetic per-doc fetch
    histories (3–12 fetches, one day apart; docs % 5 == 0 have a stable
    digest so the max-wait clamp binds; others churn every 3 fetches).
    The fold runs JVM-side (sorted collect_list + ``aggregate`` HOF per
    URI — the measured-and-kept variant; the applyInPandas version was
    rejected on cost) — the oracle replays the same law as a DuckDB
    recursive CTE."""
    from heritrix_spark.plans.revisit import RevisitConfig, wait_schedule
    d = _doc_ids(spark, sf_dir)
    n = (F.col("doc_id") % 10 + 2).cast("int")
    log = (d.select(F.col("doc_id").cast("long").alias("url_fp"),
                    F.explode(F.sequence(F.lit(0), n)).alias("i"))
           .select("url_fp",
                   (F.col("i").cast("long") * 86_400_000)
                   .alias("fetch_ts"),
                   F.when(F.col("url_fp") % 5 == 0, F.lit("stable"))
                   .otherwise(F.floor(
                       (F.col("i") + F.col("url_fp") % 7) / 3)
                       .cast("string")).alias("digest")))
    return (wait_schedule(log, RevisitConfig())
            .orderBy("url_fp", "fetch_idx"))


# ---------------------------------------------------------------------------
# Training-data pipeline ops (dedup / similarity / text analysis) — all
# routed through heritrix_spark.pipeline modules.
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via pipeline.dedup.exact_groups (digest groupBy)."""
    from heritrix_spark.pipeline.dedup import exact_groups
    d = _t(spark, sf_dir, "documents")
    return (exact_groups(d).select("digest", "n_dups", "keeper")
            .orderBy("digest"))


def q_dedup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup removal via pipeline.dedup.drop_exact_dups (min-id
    representative per digest group)."""
    from heritrix_spark.pipeline.dedup import drop_exact_dups
    d = _t(spark, sf_dir, "documents")
    return drop_exact_dups(d).select("doc_id").orderBy("doc_id")


# The three md5-MinHash entries (signatures → LSH pairs → Jaccard refine)
# share one signature pipeline per (session, sf_dir): the shingle→minhash
# pass is computed once and localCheckpointed, the banded pairs derive
# from it, and each entry reads the shared frames — results are identical
# to the standalone pipelines (same params, same hash_fn), but the corpus
# is shingled once instead of three times.
_MINHASH_SHARED: dict = {}


def _shared_minhash(spark: SparkSession, sf_dir: str):
    from heritrix_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    hit = _MINHASH_SHARED.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1], hit[2]
    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, num_hashes=4, n=2,
                              hash_fn=F.md5).localCheckpoint()
    pairs = lsh_candidate_pairs(d, num_hashes=4, bands=2, n=2,
                                hash_fn=F.md5, sigs=sigs).localCheckpoint()
    _MINHASH_SHARED[sf_dir] = (spark, sigs, pairs)
    return sigs, pairs


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram MinHash via pipeline.dedup.minhash_signatures
    (4 permutations; md5 hash_fn for cross-engine equality)."""
    sigs, _ = _shared_minhash(spark, sf_dir)
    return sigs.orderBy("doc_id")


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding → candidate pairs via
    pipeline.dedup.lsh_candidate_pairs (2 bands × 2 rows)."""
    _, pairs = _shared_minhash(spark, sf_dir)
    return pairs.orderBy("id_a", "id_b")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard refine of the LSH pairs via
    pipeline.dedup.ngram_jaccard (integer intersect/union sizes)."""
    from heritrix_spark.pipeline.dedup import ngram_jaccard
    d = _t(spark, sf_dir, "documents")
    _, pairs = _shared_minhash(spark, sf_dir)
    return (ngram_jaccard(d, pairs, n=2)
            .select("id_a", "id_b", "n_inter", "n_union")
            .orderBy("id_a", "id_b"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprint via pipeline.dedup.simhash (16 bits,
    md5-derived 32-bit word hash for cross-engine equality)."""
    from heritrix_spark.pipeline.dedup import simhash
    d = _t(spark, sf_dir, "documents")
    return simhash(d, bits=16, hash_fn=_md5_32).orderBy("doc_id")


def q_ngram_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document head fingerprint via pipeline.text.rolling_fingerprint."""
    from heritrix_spark.pipeline.text import rolling_fingerprint
    d = _t(spark, sf_dir, "documents")
    return (rolling_fingerprint(d, hash_fn=F.md5)
            .select("doc_id", "fingerprint").orderBy("doc_id"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + integer quality scoring via
    pipeline.text.quality_features."""
    from heritrix_spark.pipeline.text import quality_features
    d = _t(spark, sf_dir, "documents")
    return (quality_features(d)
            .select("doc_id", "n_chars", "n_tokens", "n_punct",
                    "n_stopwords", "quality_score_pct")
            .orderBy("doc_id"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID via pipeline.text.lang_id (argmax
    over per-language stopword hits)."""
    from heritrix_spark.pipeline.text import lang_id
    d = _t(spark, sf_dir, "documents")
    return lang_id(d).select("doc_id", "lang_guess").orderBy("doc_id")


def q_audio_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode metadata over the deterministic engine codec: clips are
    synthesized per doc_id (n_samples = 500 + 3*(doc_id % 977)), encoded
    and decoded executor-side via pipeline.multimodal.audio_features; the
    oracle recomputes the metadata arithmetic in SQL, so a header/payload
    round-trip fault surfaces as a hash mismatch."""
    import pandas as pd

    from heritrix_spark.functions import avcodec
    from heritrix_spark.pipeline.multimodal import audio_features

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def enc(batches):
        for pdf in batches:
            ks = pdf["doc_id"].to_numpy()
            yield pd.DataFrame({
                "clip_id": [f"c{int(k)}" for k in ks],
                "bytes": [avcodec.encode_audio(
                    avcodec.gen_samples(int(k), 500 + 3 * (int(k) % 977)),
                    16_000) for k in ks]})

    clips = d.mapInPandas(enc, "clip_id string, bytes binary")
    return (audio_features(clips)
            .select("clip_id", "sample_rate", "n_samples")
            .orderBy("clip_id"))


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling law over the engine frame container: videos
    synthesized per doc_id (3 + doc_id % 8 frames at 200 ms), sampled at
    one frame per 700 ms window via pipeline.multimodal.video_frame_sample;
    the oracle replays the first-frame-per-bucket law with
    generate_series, so a container-walk fault surfaces as a mismatch."""
    import pandas as pd

    from heritrix_spark.functions import avcodec
    from heritrix_spark.pipeline.multimodal import video_frame_sample

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def enc(batches):
        for pdf in batches:
            ks = pdf["doc_id"].to_numpy()
            yield pd.DataFrame({
                "video_id": [f"v{int(k)}" for k in ks],
                "bytes": [avcodec.gen_video(int(k), 3 + int(k) % 8,
                                            w=8, h=6, frame_interval_ms=200)
                          for k in ks]})

    videos = d.mapInPandas(enc, "video_id string, bytes binary")
    return (video_frame_sample(videos, every_ms=700)
            .select("video_id", "frame_idx", "ts_ms")
            .orderBy("video_id", "frame_idx"))


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k via pipeline.similarity.knn_brute (query =
    vec 0 vs the rest; rank output, float score excluded)."""
    from heritrix_spark.pipeline.similarity import knn_brute
    e = _t(spark, sf_dir, "embeddings")
    corpus = e.where(F.col("vec_id") != 0)
    query = e.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("q_id"), F.col("embedding").alias("q_vec"))
    return (knn_brute(corpus, query, k=5)
            .select("vec_id", "rank").orderBy("rank"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via
    pipeline.similarity.embedding_near_dups — hyperplane-LSH bucket
    self-join + exact cosine verify.  Axis-aligned planes (dims 0-3) so
    the DuckDB oracle reproduces the bucketing exactly; float score
    excluded from the compared output (pair ids are deterministic)."""
    from heritrix_spark.pipeline.similarity import (axis_planes,
                                                    embedding_near_dups)
    e = _t(spark, sf_dir, "embeddings")
    planes = axis_planes(spark, [0, 1, 2, 3], 64)
    return (embedding_near_dups(e, planes, threshold=0.35)
            .select("id_a", "id_b").orderBy("id_a", "id_b"))


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
        "first_arrival_dedup": q_first_arrival_dedup,
        "queue_assign_surt": q_queue_assign_surt,
        "quota_bytes_window": q_quota_bytes_window,
        "extract_html": q_extract_html,
        "extract_css": q_extract_css,
        "extract_js": q_extract_js,
        "extract_xml": q_extract_xml,
        "extract_uri": q_extract_uri,
        "extract_implied": q_extract_implied,
        "revisit_schedule": q_revisit_schedule,
        "canonicalize": q_canonicalize,
        "surt": q_surt,
        "class_key": q_class_key,
        "host_settings": q_host_settings,
        "cost_policies": q_cost_policies,
        "hop_path_ops": q_hop_path_ops,
        "scope_fold": q_scope_fold,
        "postfetch_gates": q_postfetch_gates,
        "robots_match": q_robots_match,
        "dedup_exact": q_dedup_exact,
        "dedup_drop": q_dedup_drop,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash": q_simhash,
        "ngram_fingerprint": q_ngram_fingerprint,
        "token_stats": q_token_stats,
        "lang_id": q_lang_id,
        "audio_probe": q_audio_probe,
        "video_frame_sample": q_video_frame_sample,
        "knn_brute": q_knn_brute,
        "embedding_neardup": q_embedding_neardup,
        "label_centroids_topk": q_label_centroids_topk,
    }


_WS = r"\s+"

# Shared DuckDB CTE fragments (documents word/shingle pipelines).
_SQL_WORDS = (
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')")
_SQL_SHINGLES_N2 = f"""
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, greatest(len({_SQL_WORDS}) - 2, 0) + 1),
                   x -> array_to_string(({_SQL_WORDS})[x+1:x+2], ' '))))
                   AS shingle
        FROM documents
"""
_SQL_MINHASH4 = f"""
        SELECT doc_id,
               MIN(md5('s0:' || shingle)) AS mh0,
               MIN(md5('s1:' || shingle)) AS mh1,
               MIN(md5('s2:' || shingle)) AS mh2,
               MIN(md5('s3:' || shingle)) AS mh3
        FROM ({_SQL_SHINGLES_N2}) GROUP BY doc_id
"""
_SQL_LSH_PAIRS = f"""
        WITH sigs AS ({_SQL_MINHASH4}),
        bb AS (
          SELECT doc_id, 0 AS band, md5(mh0 || ':' || mh1) AS bucket
          FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band, md5(mh2 || ':' || mh3) AS bucket
          FROM sigs)
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
"""


def _simhash16_sql() -> str:
    h = "(('0x' || substr(md5(w), 1, 8))::BIGINT)"
    votes = ",\n               ".join(
        f"SUM(CASE WHEN ({h} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(16))
    pack = " + ".join(
        f"CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END"
        for i in range(16))
    return f"""
        WITH words AS (
          SELECT doc_id, unnest({_SQL_WORDS}) AS w FROM documents),
        votes AS (
          SELECT doc_id,
               {votes}
          FROM words GROUP BY doc_id)
        SELECT doc_id, CAST({pack} AS BIGINT) AS simhash
        FROM votes ORDER BY doc_id
    """


def _lang_id_sql() -> str:
    from heritrix_spark.pipeline.text import STOPWORDS
    hits = ",\n                 ".join(
        "len(list_filter(list_filter(string_split_regex(lower(text),"
        " '\\s+'), x -> x <> ''), x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sw) + f"], x))) AS h_{lang}"
        for lang, sw in STOPWORDS.items())
    structs = ", ".join(
        f"{{'hits': h_{lang}, 'lang': '{lang}'}}" for lang in STOPWORDS)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 {hits}
          FROM documents),
        b AS (
          SELECT doc_id, list_sort([{structs}])[-1] AS best FROM t)
        SELECT doc_id,
               CASE WHEN best['hits'] > 0 THEN best['lang']
                    ELSE 'unknown' END AS lang_guess
        FROM b ORDER BY doc_id
    """


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
        "first_arrival_dedup": """
            SELECT user_id, event_type, event_id
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY CAST(user_id AS VARCHAR) || ':' || event_type
                ORDER BY ts, event_id) = 1
            ORDER BY user_id, event_type
        """,
        "queue_assign_surt": """
            SELECT doc_id,
                   'test,example,h' || (doc_id % 50) || ',' AS class_key,
                   rn
            FROM (SELECT doc_id,
                         ROW_NUMBER() OVER (PARTITION BY doc_id % 50
                                            ORDER BY doc_id ASC) AS rn
                  FROM documents)
            WHERE rn <= 5 ORDER BY doc_id
        """,
        "quota_bytes_window": """
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER w,
                       0) AS BIGINT) AS prior_qty,
                   COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER w,
                       0) >= 3000 AS blocked
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey
                         ORDER BY l_orderkey, l_linenumber, l_quantity,
                                  l_extendedprice
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
            ORDER BY l_suppkey, l_orderkey, l_linenumber, prior_qty
        """,
        "extract_html": """
            WITH d AS (
              SELECT doc_id,
                     doc_id % 50 AS m,
                     doc_id % 5 = 0 AS hasbase,
                     doc_id % 7 = 0 AS nof
              FROM documents)
            SELECT doc_id, link_idx, url, hop, hops_path FROM (
              SELECT doc_id, 0 AS link_idx,
                     CASE WHEN hasbase
                          THEN 'http://cdn.example.test/b/a' || doc_id
                               || '.html'
                          ELSE 'http://h' || m || '.example.test/d/'
                               || doc_id || '/a' || doc_id || '.html'
                     END AS url,
                     'L' AS hop, 'LL' AS hops_path
              FROM d WHERE NOT nof
              UNION ALL
              SELECT doc_id, CASE WHEN nof THEN 0 ELSE 1 END,
                     CASE WHEN hasbase THEN 'http://cdn.example.test'
                          ELSE 'http://h' || m || '.example.test'
                     END || '/i/img' || doc_id || '.png',
                     'E', 'LE'
              FROM d
              UNION ALL
              SELECT doc_id, CASE WHEN nof THEN 1 ELSE 2 END,
                     'http://api.example.test/v/' || doc_id, 'X', 'LX'
              FROM d)
            ORDER BY doc_id, link_idx
        """,
        "extract_css": """
            WITH d AS (SELECT doc_id, doc_id % 50 AS m FROM documents)
            SELECT doc_id, link_idx, url, hop, hops_path FROM (
              SELECT doc_id, 0 AS link_idx,
                     'http://h' || m || '.example.test/bg/b' || doc_id
                     || '.png' AS url,
                     'E' AS hop, 'LE' AS hops_path FROM d
              UNION ALL
              SELECT doc_id, 1,
                     'http://h' || m || '.example.test/css/img' || doc_id
                     || '.gif', 'E', 'LE' FROM d
              UNION ALL
              SELECT doc_id, 2,
                     'http://h' || m || '.example.test/css/theme' || doc_id
                     || '.css', 'E', 'LE' FROM d)
            ORDER BY doc_id, link_idx
        """,
        "extract_js": """
            WITH d AS (SELECT doc_id, doc_id % 50 AS m FROM documents)
            SELECT doc_id, link_idx, url, hop, hops_path FROM (
              SELECT doc_id, 0 AS link_idx,
                     'http://h' || m || '.example.test/api/' || doc_id
                         AS url,
                     'X' AS hop, 'LX' AS hops_path FROM d
              UNION ALL
              SELECT doc_id, 1,
                     'https://img.example.test/t/' || doc_id || '.jpg',
                     'X', 'LX' FROM d)
            ORDER BY doc_id, link_idx
        """,
        "extract_xml": """
            WITH d AS (SELECT doc_id, doc_id % 50 AS m FROM documents)
            SELECT doc_id, link_idx, url, hop, hops_path FROM (
              SELECT doc_id, 0 AS link_idx,
                     'http://h' || m || '.example.test/s/' || doc_id AS url,
                     'L' AS hop, 'LL' AS hops_path FROM d
              UNION ALL
              SELECT doc_id, 1,
                     'http://h' || m || '.example.test/feed/' || doc_id
                     || '.atom', 'L', 'LL' FROM d)
            ORDER BY doc_id, link_idx
        """,
        "extract_uri": """
            WITH d AS (SELECT doc_id,
                              doc_id % 2 = 0 AS enc,
                              doc_id % 3 = 0 AS bare
                       FROM documents)
            SELECT doc_id, link_idx, url, hop, hops_path FROM (
              SELECT doc_id, 0 AS link_idx,
                     'http://d' || doc_id || '.example.test/p' AS url,
                     'X' AS hop, 'LX' AS hops_path
              FROM d WHERE enc
              UNION ALL
              SELECT doc_id, CASE WHEN enc THEN 1 ELSE 0 END,
                     'https://n' || doc_id || '.example.test/x', 'X', 'LX'
              FROM d WHERE bare)
            ORDER BY doc_id, link_idx
        """,
        "extract_implied": """
            SELECT doc_id, 0 AS link_idx,
                   'http://h' || (doc_id % 50) || '.example.test/full/'
                   || doc_id || '.jpg' AS url,
                   'X' AS hop, 'LX' AS hops_path
            FROM documents WHERE doc_id % 2 = 0
            ORDER BY doc_id, link_idx
        """,
        "revisit_schedule": """
            WITH RECURSIVE f AS (
              SELECT doc_id AS url_fp, i.i AS fetch_idx,
                     i.i * 86400000 AS fetch_ts,
                     CASE WHEN doc_id % 5 = 0 THEN 'stable'
                          ELSE CAST(CAST(floor((i.i + doc_id % 7) / 3)
                                    AS BIGINT) AS VARCHAR)
                     END AS digest
              FROM documents,
                   LATERAL (SELECT unnest(range(0, doc_id % 10 + 3)) AS i)
                       AS i),
            m AS (
              SELECT *, COALESCE(digest <> LAG(digest)
                  OVER (PARTITION BY url_fp ORDER BY fetch_idx), true)
                  AS changed
              FROM f),
            walk AS (
              SELECT url_fp, fetch_idx, fetch_ts, changed,
                     CAST(86400000 AS DOUBLE) AS w
              FROM m WHERE fetch_idx = 0
              UNION ALL
              SELECT m.url_fp, m.fetch_idx, m.fetch_ts, m.changed,
                     CASE WHEN m.changed
                          THEN GREATEST(walk.w / 1.5, 1000.0)
                          ELSE LEAST(walk.w * 1.5, 2419200000.0) END
              FROM m JOIN walk ON m.url_fp = walk.url_fp
                              AND m.fetch_idx = walk.fetch_idx + 1)
            SELECT url_fp, fetch_idx, fetch_ts, changed,
                   CAST(trunc(w) AS BIGINT) AS wait_ms,
                   fetch_ts + CAST(trunc(w) AS BIGINT) AS next_fetch_ts
            FROM walk ORDER BY url_fp, fetch_idx
        """,
        "canonicalize": """
            SELECT doc_id,
                   'http://h' || (doc_id % 50) || '.example.test/a/p/'
                   || doc_id || '?x=' || doc_id || '&y=1' AS canon_url
            FROM documents ORDER BY doc_id
        """,
        "surt": """
            SELECT doc_id,
                   'https://(org,example,sub,h' || (doc_id % 50)
                   || ',):8443/p/' || doc_id AS surt
            FROM documents ORDER BY doc_id
        """,
        "class_key": """
            SELECT doc_id,
                   'h' || (doc_id % 50) || '.example.test'
                   || CASE WHEN doc_id % 3 = 2 THEN ':8080' ELSE '' END
                       AS class_key
            FROM documents ORDER BY doc_id
        """,
        "host_settings": """
            WITH h AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 0
                            THEN 'h' || (doc_id % 50) || '.other.test'
                          WHEN doc_id % 7 = 0
                            THEN 'x' || (doc_id % 9) || '.sub.example.test'
                          ELSE 'h' || (doc_id % 50) || '.example.test'
                     END AS host
              FROM documents),
            g AS (
              SELECT doc_id, host,
                     CASE WHEN host = 'sub.example.test'
                            OR host LIKE '%.sub.example.test' THEN 3
                          WHEN host = 'h7.example.test'
                            OR host LIKE '%.h7.example.test' THEN 1
                          WHEN host = 'example.test'
                            OR host LIKE '%.example.test' THEN 2
                          ELSE 0 END AS sgroup
              FROM h),
            e AS (
              SELECT *,
                     CASE sgroup WHEN 1 THEN 1.0 WHEN 3 THEN 2.0
                          ELSE 5.0 END AS dfactor,
                     CASE sgroup WHEN 1 THEN 750 WHEN 2 THEN 6000
                          ELSE 3000 END AS mind,
                     CASE sgroup WHEN 3 THEN 8000 ELSE 30000 END AS maxd,
                     500 * (1 + doc_id % 4) AS fetch_ms
              FROM g)
            SELECT doc_id, host, sgroup,
                   CAST(mind AS INTEGER) AS eff_min_delay_ms,
                   CAST(LEAST(GREATEST(dfactor * fetch_ms, mind), maxd)
                        AS BIGINT) AS politeness_ms
            FROM e ORDER BY doc_id
        """,
        "cost_policies": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN 5
                          ELSE 3 END AS nsegs,
                     CASE WHEN doc_id % 3 = 0
                          THEN 2 + CAST(floor((2 + doc_id % 40) / 32) AS INT)
                          ELSE 0 END AS qcost,
                     CASE WHEN doc_id % 4 = 0 THEN 7 ELSE 0 END AS cal
              FROM documents)
            SELECT doc_id,
                   CAST(1 + nsegs + qcost AS INT) AS wag_cost,
                   CAST(1 + nsegs + qcost + cal AS INT)
                       AS anticalendar_cost
            FROM t ORDER BY doc_id
        """,
        "hop_path_ops": """
            SELECT doc_id,
                   CAST(doc_id % 5 AS INT) AS n_link_hops,
                   CAST(doc_id % 3
                        + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                        AS INT) AS n_trans_tail
            FROM documents ORDER BY doc_id
        """,
        "scope_fold": """
            SELECT doc_id,
                   (doc_id % 13 = 0)
                   OR (doc_id % 7 <= 4 AND doc_id % 4 <= 2
                       AND (doc_id % 8)
                           + CASE WHEN doc_id % 11 = 0 THEN 3 ELSE 0 END <= 5
                       AND doc_id % 11 <> 0) AS accepted
            FROM documents ORDER BY doc_id
        """,
        "postfetch_gates": """
            SELECT doc_id,
                   (doc_id % 9 NOT IN (0, 1))          -- status = 200
                   AND NOT (doc_id % 2 = 1)            -- mime_reject jpeg$
                   AS extract_ok,
                   (doc_id % 9 <> 1)                   -- status in (200,404)
                   AND true                            -- mime_accept ^image/
                   AND (4096 * (1 + doc_id % 8) <= 4096 * 6) AS write_ok
            FROM documents ORDER BY doc_id
        """,
        "robots_match": """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN true   -- /a/x    (Dis /a)
                        WHEN doc_id % 5 = 1 THEN false  -- /a/b/c  (All /a/b)
                        WHEN doc_id % 5 = 2 THEN true   -- /c/z    (Dis /c)
                        WHEN doc_id % 5 = 3 THEN false  -- /d      (no rule)
                        ELSE false                      -- /robots.txt
                   END AS disallowed
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS digest, COUNT(*) AS n_dups,
                   MIN(doc_id) AS keeper
            FROM documents GROUP BY md5(text) ORDER BY digest
        """,
        "dedup_drop": """
            SELECT doc_id FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id) = 1
            ORDER BY doc_id
        """,
        "minhash_signatures": f"""
            {_SQL_MINHASH4} ORDER BY doc_id
        """,
        "lsh_pairs": f"""
            {_SQL_LSH_PAIRS} ORDER BY id_a, id_b
        """,
        "ngram_jaccard": f"""
            WITH pairs AS ({_SQL_LSH_PAIRS}),
            sets AS (
              SELECT doc_id, list_distinct(list(shingle)) AS sset
              FROM ({_SQL_SHINGLES_N2}) GROUP BY doc_id)
            SELECT p.id_a, p.id_b,
                   len(list_intersect(a.sset, b.sset)) AS n_inter,
                   len(list_distinct(a.sset || b.sset)) AS n_union
            FROM pairs p JOIN sets a ON p.id_a = a.doc_id
                         JOIN sets b ON p.id_b = b.doc_id
            ORDER BY p.id_a, p.id_b
        """,
        "simhash": _simhash16_sql(),
        "ngram_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(substr(text, 1, 64)),
                                      '[^a-z0-9]', '', 'g')) AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "token_stats": f"""
            WITH t AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len({_SQL_WORDS}) AS n_tokens,
                     length(regexp_replace(text, '[^!?.,;:]', '', 'g'))
                         AS n_punct,
                     len(list_filter(
                         list_filter(string_split_regex(lower(text),
                                                        '\\s+'),
                                     x -> x <> ''),
                         x -> list_contains(['the','and','of','to','a','in',
                                             'is','that','it','for'], x)))
                         AS n_stopwords
              FROM documents)
            SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
                   CAST(CASE WHEN n_tokens BETWEEN 10 AND 100000
                             THEN 40 ELSE 0 END
                        + CASE WHEN n_chars >= 3 * n_tokens
                                AND n_chars <= 12 * n_tokens
                               THEN 20 ELSE 0 END
                        + CASE WHEN 5 * n_punct <= n_chars
                               THEN 20 ELSE 0 END
                        + CASE WHEN 50 * n_stopwords >= n_tokens
                               THEN 20 ELSE 0 END AS INT)
                       AS quality_score_pct
            FROM t ORDER BY doc_id
        """,
        "lang_id": _lang_id_sql(),
        "audio_probe": """
            SELECT 'c' || CAST(doc_id AS VARCHAR) AS clip_id,
                   CAST(16000 AS INT) AS sample_rate,
                   CAST(500 + 3 * (doc_id % 977) AS BIGINT) AS n_samples
            FROM documents ORDER BY clip_id
        """,
        "video_frame_sample": """
            WITH f AS (
                SELECT doc_id, 3 + (doc_id % 8) AS n_frames FROM documents),
            idx AS (
                SELECT doc_id,
                       unnest(generate_series(0, n_frames - 1)) AS i
                FROM f),
            fr AS (
                SELECT 'v' || CAST(doc_id AS VARCHAR) AS video_id,
                       CAST(i AS INT) AS frame_idx,
                       CAST(i * 200 AS BIGINT) AS ts_ms,
                       (i * 200) // 700 AS bucket
                FROM idx)
            SELECT video_id, min(frame_idx) AS frame_idx,
                   min(ts_ms) AS ts_ms
            FROM fr GROUP BY video_id, bucket
            ORDER BY video_id, frame_idx
        """,
        "knn_brute": """
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY
                       list_cosine_similarity(
                           list_transform(embedding,
                                          x -> CAST(x AS DOUBLE)),
                           list_transform(qv, x -> CAST(x AS DOUBLE)))
                       DESC, vec_id) AS INT) AS rank
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY rank LIMIT 5
        """,
        "embedding_neardup": """
            WITH b AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                     (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
                   + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
                   + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
                       AS bucket
              FROM embeddings)
            SELECT a.vec_id AS id_a, bb.vec_id AS id_b
            FROM b a JOIN b bb
              ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
            WHERE list_cosine_similarity(a.v, bb.v) >= 0.35
            ORDER BY id_a, id_b
        """,
        "label_centroids_topk": """
            SELECT label, COUNT(*) AS n_members, MIN(vec_id) AS min_vec
            FROM embeddings GROUP BY label ORDER BY label
        """,
    }
