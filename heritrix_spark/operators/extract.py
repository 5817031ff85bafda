"""Outlink extractor — the synthetic-web link graph as pure Spark exprs.

Heritrix parity: ``org/archive/crawler/extractor/ExtractorHTML.java`` is the
flatMap from a fetched page to candidate ``Link``s (hop types L/E/X per
``extractor/Link.java``).  In this sandbox the "web" is the deterministic
fixture graph (:mod:`heritrix_spark.fixtures.websim`), so the extractor is a
closed-form ``posexplode`` over JVM-side expressions — zero Python in the
hot path (BASELINE.json input_hint).  A real-HTML variant would swap
``outlinks_of`` for a regex/pandas-UDF extractor with the same output
schema; nothing downstream changes.

Parity contract: every expression here mirrors a websim function one-to-one
(Python floored ``%``/``>>`` == Spark ``pmod``/``shiftright`` on signed
longs; ``xxhash64`` == ``hash_str_py``), property-tested in
tests/test_extract_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.fixtures.websim import (
    FixtureSpec,
    HOST_FMT,
    PAGE_BUCKET,
    SESSION_TOKEN,
    TRAP_MOD,
    VARIANT_MOD,
)

_HOST_PAT = HOST_FMT.replace("{:04d}", "%04d")


def _x(tag: str, *parts: Column) -> Column:
    """xxhash64('tag:p1:…') — mirror of websim._u."""
    return F.xxhash64(F.concat_ws(":", F.lit(tag),
                                  *[p.cast("string") for p in parts]))


def host_index_expr(k: Column, n_hosts: int) -> Column:
    b1 = F.pmod(_x("h1", k), F.lit(n_hosts))
    b2 = F.pmod(_x("h2", k), b1 + F.lit(1))
    return F.pmod(_x("h3", k), b2 + F.lit(1))


def is_trap_expr(k: Column) -> Column:
    return F.pmod(_x("trap", k), F.lit(TRAP_MOD)) == F.lit(0)


def url_of_expr(k: Column, n_hosts: int) -> Column:
    """Mirror of websim.url_of — canonical URL of page k."""
    host = F.format_string(_HOST_PAT, host_index_expr(k, n_hosts))
    trap = F.format_string(
        "http://%s/cal/2026/%02d/%02d/img%08d",
        host, F.lit(1) + F.pmod(k, F.lit(12)),
        F.lit(1) + F.pmod(k, F.lit(28)), k)
    base = F.format_string(
        "http://%s/p/%d/img%08d",
        host, F.floor(k / F.lit(PAGE_BUCKET)).cast("long"), k)
    return F.when(is_trap_expr(k), trap).otherwise(base)


def image_id_expr(url: Column) -> Column:
    """Mirror of websim.image_id_of_url; NULL when not an image URL."""
    s = F.regexp_extract(url, r"/img(\d{8})", 1)
    return F.when(s == F.lit(""), F.lit(None).cast("long")).otherwise(
        s.cast("long"))


def variant_expr(url: Column, k: Column, j: Column) -> Column:
    """Mirror of websim.variant_of — duplicate-variant link decoration."""
    v = _x("var", k, j)
    kind = F.pmod(F.shiftright(v, 8), F.lit(4))
    decorated = (
        F.when(kind == 0, F.regexp_replace(url, "^http://", "http://www."))
        .when(kind == 1, F.concat(url, F.lit("?jsessionid=" + SESSION_TOKEN),
                                  F.pmod(k, F.lit(10)).cast("string")))
        .when(kind == 2, F.concat(url, F.lit("?")))
        .otherwise(F.regexp_replace(url, "^http://", "http://user@"))
    )
    return F.when(F.pmod(v, F.lit(VARIANT_MOD)) == 0, decorated).otherwise(url)


_ABS_RE = r"(?i)^[a-z][a-z0-9+.\-]*:"
# attribute extraction patterns (Java regex, used via regexp_extract_all)
_A_HREF_RE = r"(?i)<(?:a|area)\s[^>]*?href\s*=\s*[\"']([^\"'#>][^\"'>]*)"
_FORM_ACTION_RE = r"(?i)<form\s[^>]*?action\s*=\s*[\"']([^\"'#>][^\"'>]*)"
_SRC_RE = (r"(?i)<(?:img|script|iframe|frame|embed|source|input|audio|video)"
           r"\s[^>]*?src\s*=\s*[\"']([^\"'#>][^\"'>]*)")
_LINK_HREF_RE = r"(?i)<link\s[^>]*?href\s*=\s*[\"']([^\"'#>][^\"'>]*)"
_BACKGROUND_RE = r"(?i)\sbackground\s*=\s*[\"']([^\"'#>][^\"'>]*)"
_BASE_RE = r"(?i)<base\s[^>]*?href\s*=\s*[\"']([^\"'>]+)"
_META_NOFOLLOW_RE = (r"(?i)<meta\s[^>]*?name\s*=\s*[\"']?robots[^>]*?"
                     r"nofollow")
_SCRIPT_URL_RE = r"[\"'](https?://[^\"'\s<>]+)[\"']"


def _resolve_expr(base: Column):
    """RFC-3986-lite reference resolution as a lambda over link strings:
    absolute → as-is; ``//host/…`` → base scheme; ``/path`` → base
    authority root; relative → base directory."""
    scheme = F.regexp_extract(base, r"(?i)^([a-z][a-z0-9+.\-]*):", 1)
    root = F.regexp_extract(base, r"(?i)^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1)
    # directory of the base: strip after last '/' past the authority
    dirp = F.when(
        F.regexp_extract(base, r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*(/.*)$",
                         1) == "",
        F.concat(root, F.lit("/"))
    ).otherwise(F.regexp_replace(base, r"[^/]*$", ""))

    def resolve(u: Column) -> Column:
        return (
            F.when(u.rlike(_ABS_RE), u)
            .when(u.startswith("//"), F.concat(scheme, F.lit(":"), u))
            .when(u.startswith("/"), F.concat(root, u))
            .otherwise(F.concat(dirp, u)))

    return resolve


def outlinks_html(fetched: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  hops_col: str = "hops_path") -> DataFrame:
    """Real-HTML extractor (ExtractorHTML regex semantics) — the
    swap-in variant of :func:`outlinks_of` with the same output schema
    (``via``, ``link_idx``, ``url``, ``hop``, ``hops_path``).

    All JVM-side: ``regexp_extract_all`` per attribute class, base-href
    handling, meta-robots-nofollow honoring, higher-order ``transform``
    for reference resolution, one ``posexplode``.  Hop types per
    ``extractor/Link.java``: a/area href + form action → L navlink,
    src/link-href/background → E embed, quoted absolute URLs inside
    <script> bodies → X speculative."""
    base = F.coalesce(
        F.nullif(F.regexp_extract(F.col(html_col), _BASE_RE, 1), F.lit("")),
        F.col(url_col))
    resolve = _resolve_expr(base)
    nofollow = F.col(html_col).rlike(_META_NOFOLLOW_RE)

    def tagged(pat: str, hop: str) -> Column:
        urls = F.regexp_extract_all(F.col(html_col), F.lit(pat), 1)
        return F.transform(urls, lambda u: F.struct(
            resolve(u).alias("u"), F.lit(hop).alias("hop")))

    nav = F.concat(tagged(_A_HREF_RE, "L"), tagged(_FORM_ACTION_RE, "L"))
    nav = F.filter(nav, lambda _: ~nofollow)  # meta-robots nofollow
    emb = F.concat(tagged(_SRC_RE, "E"), tagged(_LINK_HREF_RE, "E"),
                   tagged(_BACKGROUND_RE, "E"))
    scripts = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<script[^>]*>(.*?)</script>"), 1)
    spec_urls = F.flatten(F.transform(
        scripts, lambda s: F.regexp_extract_all(
            s, F.lit(_SCRIPT_URL_RE), 1)))
    spec = F.transform(spec_urls, lambda u: F.struct(
        u.alias("u"), F.lit("X").alias("hop")))
    links = F.concat(nav, emb, spec)
    # links references url_col/html_col — explode BEFORE renaming them.
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops", html_col))


_CSS_URL_RE = r"(?i)url\(\s*[\"']?([^\"')\s][^\"')]*)[\"']?\s*\)"
_CSS_IMPORT_RE = r"(?i)@import\s+[\"']([^\"']+)[\"']"


def outlinks_css(fetched: DataFrame, url_col: str = "url",
                 css_col: str = "css",
                 hops_col: str = "hops_path") -> DataFrame:
    """ExtractorCSS — stylesheet link extraction, same output schema as
    :func:`outlinks_html` (``via``, ``link_idx``, ``url``, ``hop``,
    ``hops_path``).  Heritrix parity (class anchor):
    ``org/archive/crawler/extractor/ExtractorCSS.java`` — ``url(...)``
    tokens and ``@import "..."`` / ``@import url(...)`` rules, all hop
    type E (embed).  JVM-side throughout: ``regexp_extract_all`` +
    higher-order ``transform`` resolution + one ``posexplode``."""
    resolve = _resolve_expr(F.col(url_col))
    # @import url(...) is matched by the url() pattern; the quoted-string
    # @import form needs its own pattern.  De-dup across the two is left
    # to the candidate pipeline (UriUniqFilter), as in the reference.
    refs = F.concat(
        F.regexp_extract_all(F.col(css_col), F.lit(_CSS_URL_RE), 1),
        F.regexp_extract_all(F.col(css_col), F.lit(_CSS_IMPORT_RE), 1))
    links = F.transform(refs, lambda u: F.struct(
        resolve(u).alias("u"), F.lit("E").alias("hop")))
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops", css_col))


def outlinks_js(fetched: DataFrame, url_col: str = "url",
                js_col: str = "js",
                hops_col: str = "hops_path") -> DataFrame:
    """ExtractorJS — quoted absolute URLs inside script bodies, hop type
    X (speculative).  Heritrix parity (class anchor):
    ``org/archive/crawler/extractor/ExtractorJS.java``.  Same output
    schema as :func:`outlinks_html`."""
    urls = F.regexp_extract_all(F.col(js_col), F.lit(_SCRIPT_URL_RE), 1)
    links = F.transform(urls, lambda u: F.struct(
        u.alias("u"), F.lit("X").alias("hop")))
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops", js_col))


_XML_LOC_RE = r"(?is)<loc\s*>\s*([^<\s][^<]*?)\s*</loc\s*>"
_XML_HREF_RE = r"(?i)\shref\s*=\s*[\"']([^\"'#>][^\"'>]*)"


def outlinks_xml(fetched: DataFrame, url_col: str = "url",
                 xml_col: str = "xml",
                 hops_col: str = "hops_path") -> DataFrame:
    """ExtractorXML — sitemap/feed link extraction, same output schema as
    :func:`outlinks_html`.  Heritrix parity (class anchor):
    ``org/archive/crawler/extractor/ExtractorXML.java`` — ``<loc>`` text
    (sitemap.xml / sitemapindex) and ``href=`` attributes (Atom/RSS
    links), hop type L (navlink, as the reference treats discovered URIs).
    JVM-side throughout: ``regexp_extract_all`` + higher-order
    ``transform`` resolution + one ``posexplode``."""
    resolve = _resolve_expr(F.col(url_col))
    refs = F.concat(
        F.regexp_extract_all(F.col(xml_col), F.lit(_XML_LOC_RE), 1),
        F.regexp_extract_all(F.col(xml_col), F.lit(_XML_HREF_RE), 1))
    links = F.transform(refs, lambda u: F.struct(
        resolve(u).alias("u"), F.lit("L").alias("hop")))
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops", xml_col))


_QUERY_VAL_RE = r"(?i)[?&][^=&#]+=([^&#]*)"


def outlinks_uri(fetched: DataFrame, url_col: str = "url",
                 hops_col: str = "hops_path") -> DataFrame:
    """ExtractorURI — mine the URI ITSELF for embedded URIs: query-string
    parameter values that are (possibly %-encoded) absolute http(s) URLs,
    e.g. ``?redir=http%3A%2F%2Fx.test%2Fp``.  Heritrix parity (class
    anchor): ``org/archive/crawler/extractor/ExtractorURI.java`` — hop
    type X (speculative).  Same output schema as :func:`outlinks_html`
    (``via``, ``link_idx``, ``url``, ``hop``, ``hops_path``).  JVM-side
    throughout: ``regexp_extract_all`` over the query string, ``url_decode``
    via ``transform``, ``filter`` to http(s), one ``posexplode``."""
    vals = F.regexp_extract_all(F.col(url_col), F.lit(_QUERY_VAL_RE), 1)
    decoded = F.transform(vals, lambda v: F.when(
        v.rlike("(?i)%3A%2F%2F"), F.try_url_decode(v)).otherwise(v))
    urls = F.filter(decoded, lambda v: v.rlike(r"(?i)^https?://."))
    links = F.transform(urls, lambda u: F.struct(
        u.alias("u"), F.lit("X").alias("hop")))
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops"))


def outlinks_implied(fetched: DataFrame, trigger: str, build: str,
                     url_col: str = "url",
                     hops_col: str = "hops_path") -> DataFrame:
    """ExtractorImpliedURI — one configured (trigger-regex, build-
    replacement) rewrite of the via URI; emits the rewritten URI iff the
    trigger matched and the result differs from the original (e.g. a
    thumbnail URL implying its full-size image).  Heritrix parity (class
    anchor): ``org/archive/crawler/extractor/ExtractorImpliedURI.java`` —
    hop type X (speculative, per the 1.14 Link vocabulary L/E/X/R/P).
    Same output schema as :func:`outlinks_html`.  JVM-side:
    ``regexp_replace`` + one ``posexplode`` over a 0/1-element array."""
    implied = F.regexp_replace(F.col(url_col), trigger, build)
    emit = (F.col(url_col).rlike(trigger)
            & (implied != F.col(url_col)) & (implied != ""))
    links = F.when(emit, F.array(F.struct(
        implied.alias("u"), F.lit("X").alias("hop")))).otherwise(
        F.array().cast("array<struct<u:string,hop:string>>"))
    df = (fetched
          .select("*", F.posexplode(links).alias("link_idx", "_l"))
          .withColumnRenamed(url_col, "via")
          .withColumnRenamed(hops_col, "parent_hops"))
    return (df.withColumn("url", F.col("_l.u"))
            .withColumn("hop", F.col("_l.hop"))
            .withColumn("hops_path",
                        F.concat(F.col("parent_hops"), F.col("hop")))
            .drop("_l", "parent_hops"))


def outlinks_of(fetched: DataFrame, spec: FixtureSpec) -> DataFrame:
    """Explode fetched pages into candidate links.

    Input: rows with ``url`` (the fetched URL), ``hops_path``, plus any
    parent-order columns the caller carries through.  Output: input columns
    (parent's renamed ``via``/``parent_hops``) + ``link_idx``, ``url``,
    ``hop``, ``hops_path``.  Trap pages and non-image URLs yield no rows.
    """
    k = image_id_expr(F.col("url"))
    df = (
        fetched.withColumn("_k", k)
        .where(F.col("_k").isNotNull() & ~is_trap_expr(F.col("_k"))
               & (F.col("_k") < F.lit(spec.n_images)))
        .withColumnRenamed("url", "via")
        .withColumnRenamed("hops_path", "parent_hops")
    )
    n = F.when(F.pmod(F.col("_k"), F.lit(7)) == 0, F.lit(6)).otherwise(F.lit(5))
    hops = F.slice(F.array(*[F.lit(c) for c in "LLLEEX"]), F.lit(1), n)
    df = df.select("*", F.posexplode(hops).alias("link_idx", "hop"))
    t = F.pmod(_x("link", F.col("_k"), F.col("link_idx")),
               F.lit(spec.n_link_space))
    return (
        df.withColumn("url", variant_expr(url_of_expr(t, spec.n_hosts),
                                          F.col("_k"), F.col("link_idx")))
        .withColumn("hops_path", F.concat(F.col("parent_hops"), F.col("hop")))
        .drop("_k", "parent_hops")
    )
