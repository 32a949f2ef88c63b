"""Web-corpus URL operators: normalization, canonical dedup, domain
report.

A crawl-derived corpus keys provenance on URLs, and raw URLs are a
notoriously noisy key: scheme/host case, ``www.`` prefixes, default
ports, tracking parameters (``utm_*``, ``ref``, click ids), parameter
order, trailing slashes and fragments all produce byte-distinct URLs
for the same resource. ``url_normalize`` applies the standard
canonicalization rules as ONE native projection (zero shuffle, RE2∩Java
regex subset — the pii_scrub discipline), ``url_dedup`` groups on the
canonical form (exact_dedup's one-combinable-groupBy scale shape), and
``domain_report`` aggregates per REGISTRABLE domain (host suffix with a
small multi-part-TLD table) — the pre-flight for ``domain_cap``'s
"no domain may dominate" rule on web corpora.

The driver testdata carries no URL column, so ``url_table`` synthesizes
deterministic messy URLs from ``doc_id`` via the portable hash — the
``real_media_table`` pattern: the fixture formula is reproducible in
DuckDB, so every operator on top is exactly oracle-checkable.

Reference: wilko2587/DataFrameUtils has no web surface (SURVEY §2.3);
this is north-star pipeline capability (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.operators.dedup import (
    portable_hash60,
    portable_hash60_sql,
)

# public-suffix-style multi-part TLDs the registrable-domain heuristic
# recognizes (a bounded literal — the full public-suffix list would be
# a broadcast table, same plan shape)
MULTI_TLDS = ("co.uk", "com.au", "co.jp", "org.uk", "com.br")

# tracking parameters stripped by normalization (lowercase prefixes)
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")


# ---------------------------------------------------------------------------
# deterministic messy-URL fixture (real_media_table pattern)
# ---------------------------------------------------------------------------

_SUFFIXES = (".example.com", ".shop.co.uk", ".data.io", ".archive.org",
             ".news.com.au")


def url_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize one deterministic MESSY url per doc. The RESOURCE
    identity (scheme, host, explicit port, path, real query param)
    hangs off ``doc_id DIV 3`` — so every 3 consecutive docs point at
    the same resource — while the crawl mess (``WWW.`` casing, default
    ports, trailing slash, tracking params, parameter order, fragment)
    hangs off ``doc_id`` itself: byte-distinct raw URLs that normalize
    to ONE canonical form, exactly the re-crawl/tracking-link
    duplication a web corpus carries. Both hashes are the portable
    md5, so the DuckDB oracle (:func:`url_table_sql`) rebuilds
    byte-identical strings."""
    hr = portable_hash60(
        F.concat(F.lit("url:"), (F.col(id_col) / 3).cast("long").cast("string"))
    )
    hd = portable_hash60(
        F.concat(F.lit("urld:"), F.col(id_col).cast("string"))
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"), hr.alias("hr"), hd.alias("hd")
    )
    e = F.expr
    scheme = e("CASE WHEN hr % 2 = 0 THEN 'http' ELSE 'https' END")
    www = e("CASE WHEN hd % 3 = 0 THEN 'WWW.' ELSE '' END")
    hostbase = e("concat('Host', CAST((hr DIV 7) % 40 AS STRING))")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _SUFFIXES]),
        (e("(hr DIV 11) % 5") + 1).cast("int"),
    )
    # resource may sit on an explicit :8080; otherwise some docs spell
    # out the scheme's default port (normalization strips it)
    port = e(
        "CASE WHEN (hr DIV 13) % 3 = 0 THEN ':8080' "
        "WHEN (hd DIV 2) % 3 = 0 THEN "
        "  CASE WHEN hr % 2 = 0 THEN ':80' ELSE ':443' END "
        "ELSE '' END"
    )
    path = e(
        "concat('/p/', CAST((hr DIV 17) % 25 AS STRING), "
        "CASE WHEN (hd DIV 3) % 3 = 0 THEN '/' ELSE '' END)"
    )
    p_id = e("concat('id=', CAST((hr DIV 23) % 1000 AS STRING))")
    p_utm = e(
        "CASE WHEN (hd DIV 5) % 2 = 0 THEN "
        "concat('utm_source=feed', CAST((hd DIV 7) % 5 AS STRING)) "
        "ELSE '' END"
    )
    p_ref = e("CASE WHEN (hd DIV 11) % 3 = 0 THEN 'ref=tw' ELSE '' END")
    joined_a = F.concat_ws("&", p_id, p_utm, p_ref)
    joined_b = F.concat_ws("&", p_utm, p_ref, p_id)
    # concat_ws skips NULLs but keeps empty strings — collapse the
    # duplicate separators deterministically in both engines
    q = F.regexp_replace(
        F.regexp_replace(
            F.when(e("(hd DIV 13) % 2 = 0"), joined_a).otherwise(joined_b),
            "&+", "&",
        ),
        "^&|&$", "",
    )
    frag = e(
        "CASE WHEN (hd DIV 17) % 3 = 0 THEN "
        "concat('#s', CAST((hd DIV 19) % 9 AS STRING)) ELSE '' END"
    )
    url = F.concat(
        scheme, F.lit("://"), www, hostbase, suffix, port, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        frag,
    )
    return d.select("doc_id", url.alias("url"))


def url_table_sql(table: str = "documents") -> str:
    """DuckDB CTE body rebuilding :func:`url_table`'s strings."""
    hr = portable_hash60_sql("('url:' || (doc_id // 3)::VARCHAR)")
    hd = portable_hash60_sql("('urld:' || doc_id::VARCHAR)")
    sfx = (
        "CASE (hr // 11) % 5 "
        + " ".join(
            f"WHEN {i} THEN '{s}'" for i, s in enumerate(_SUFFIXES)
        )
        + " END"
    )
    return f"""
  SELECT doc_id,
         concat(
           CASE WHEN hr % 2 = 0 THEN 'http' ELSE 'https' END, '://',
           CASE WHEN hd % 3 = 0 THEN 'WWW.' ELSE '' END,
           'Host', CAST((hr // 7) % 40 AS VARCHAR), {sfx},
           CASE WHEN (hr // 13) % 3 = 0 THEN ':8080'
           WHEN (hd // 2) % 3 = 0 THEN
             CASE WHEN hr % 2 = 0 THEN ':80' ELSE ':443' END
           ELSE '' END,
           '/p/', CAST((hr // 17) % 25 AS VARCHAR),
           CASE WHEN (hd // 3) % 3 = 0 THEN '/' ELSE '' END,
           CASE WHEN q <> '' THEN '?' || q ELSE '' END,
           CASE WHEN (hd // 17) % 3 = 0 THEN
             '#s' || CAST((hd // 19) % 9 AS VARCHAR) ELSE '' END
         ) AS url
  FROM (
    SELECT doc_id, hr, hd,
           regexp_replace(regexp_replace(
             CASE WHEN (hd // 13) % 2 = 0
               THEN concat_ws('&', p_id, p_utm, p_ref)
               ELSE concat_ws('&', p_utm, p_ref, p_id) END,
             '&+', '&', 'g'), '^&|&$', '', 'g') AS q
    FROM (
      SELECT doc_id, hr, hd,
             'id=' || CAST((hr // 23) % 1000 AS VARCHAR) AS p_id,
             CASE WHEN (hd // 5) % 2 = 0
               THEN 'utm_source=feed' || CAST((hd // 7) % 5 AS VARCHAR)
               ELSE '' END AS p_utm,
             CASE WHEN (hd // 11) % 3 = 0 THEN 'ref=tw' ELSE '' END AS p_ref
      FROM (SELECT doc_id, {hr} AS hr, {hd} AS hd FROM {table})
    )
  )"""


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def _norm_cols(url: Column) -> dict[str, Column]:
    """Shared parse + normalize expressions (one projection)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]*)", 1)
    raw_path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    raw_q = F.regexp_extract(url, r"\?([^#]*)", 1)
    host = F.regexp_replace(
        F.lower(F.substring_index(hostport, ":", 1)), r"^www\.", ""
    )
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(raw_path, r"/+$", "")
    # startswith, NOT `LIKE 'utm_%'`: in SQL LIKE `_` is a single-char
    # wildcard, so the LIKE form also stripped e.g. 'utmx=1' (r12
    # advice). Exact-prefix match on both engines.
    like = " OR ".join(
        f"startswith(p, '{pre}')" for pre in TRACKING_PREFIXES
    )
    kept = F.expr(
        f"array_sort(filter(split(_rq, '&'), p -> p <> '' AND NOT ({like})))"
    )
    return {
        "scheme": scheme,
        "host": host,
        "keep_port": keep_port,
        "port": port,
        "path": path,
        "raw_q": raw_q,
        "kept": kept,
    }


def url_normalize(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonicalize URLs: lowercase scheme/host, strip ``www.``,
    default ports, fragments, trailing slashes and tracking params
    (``utm_*``/``gclid``/``fbclid``/``ref``), and SORT the surviving
    query parameters — one scan-side projection, no shuffle.

    Also emits the REGISTRABLE domain: the last two host labels, or
    three when the two-label suffix is a known multi-part TLD
    (co.uk-style, ``MULTI_TLDS``) — the key ``domain_cap`` and crawl
    politeness budgets group on.

    Output: (doc_id, url, norm_url, host, domain, n_params_kept,
    n_params_dropped).
    """
    c = _norm_cols(F.col(url_col))
    d = urls.withColumn("_rq", c["raw_q"]).withColumn("_kept", c["kept"])
    nq = F.array_join(F.col("_kept"), "&")
    all_params = F.expr("filter(split(_rq, '&'), p -> p <> '')")
    labels = F.split(c["host"], r"\.")
    nlab = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    domain = F.when(nlab <= 2, c["host"]).otherwise(
        F.when(
            last2.isin(*MULTI_TLDS), last3
        ).otherwise(last2)
    )
    norm = F.concat(
        c["scheme"],
        F.lit("://"),
        c["host"],
        F.when(c["keep_port"], F.concat(F.lit(":"), c["port"])).otherwise(
            F.lit("")
        ),
        c["path"],
        F.when(nq != "", F.concat(F.lit("?"), nq)).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        F.col(url_col).alias("url"),
        norm.alias("norm_url"),
        c["host"].alias("host"),
        domain.alias("domain"),
        F.size(F.col("_kept")).alias("n_params_kept"),
        (F.size(all_params) - F.size(F.col("_kept"))).alias(
            "n_params_dropped"
        ),
    )


def _norm_sql(url_expr: str = "url") -> str:
    """DuckDB SELECT body mirroring :func:`url_normalize` (expects a
    relation with (doc_id, url) in scope as ``u``)."""
    like = " OR ".join(
        f"starts_with(p, '{pre}')" for pre in TRACKING_PREFIXES
    )
    return f"""
  SELECT doc_id, {url_expr} AS url,
         concat(
           scheme, '://', host,
           CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                     AND NOT (scheme = 'https' AND port = '443')
             THEN ':' || port ELSE '' END,
           path,
           CASE WHEN array_to_string(kept, '&') <> ''
             THEN '?' || array_to_string(kept, '&') ELSE '' END
         ) AS norm_url,
         host,
         CASE WHEN len(labels) <= 2 THEN host
              WHEN (labels[-2] || '.' || labels[-1]) IN
                   ({", ".join(f"'{t}'" for t in MULTI_TLDS)})
                THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
              ELSE labels[-2] || '.' || labels[-1] END AS domain,
         len(kept)::INT AS n_params_kept,
         (len(list_filter(string_split(raw_q, '&'), p -> p <> ''))
           - len(kept))::INT AS n_params_dropped
  FROM (
    SELECT doc_id, {url_expr},
           lower(regexp_extract({url_expr}, '^([A-Za-z]+)://', 1)) AS scheme,
           regexp_replace(
             lower(string_split(
               regexp_extract({url_expr}, '^[A-Za-z]+://([^/?#]*)', 1),
               ':')[1]),
             '^www\\.', '') AS host,
           CASE WHEN contains(
                  regexp_extract({url_expr}, '^[A-Za-z]+://([^/?#]*)', 1),
                  ':')
             THEN string_split(
               regexp_extract({url_expr}, '^[A-Za-z]+://([^/?#]*)', 1),
               ':')[-1] ELSE '' END AS port,
           regexp_replace(
             regexp_extract({url_expr},
               '^[A-Za-z]+://[^/?#]*([^?#]*)', 1),
             '/+$', '') AS path,
           regexp_extract({url_expr}, '\\?([^#]*)', 1) AS raw_q,
           list_sort(list_filter(string_split(
             regexp_extract({url_expr}, '\\?([^#]*)', 1), '&'),
             p -> p <> '' AND NOT ({like}))) AS kept,
           string_split(
             regexp_replace(
               lower(string_split(
                 regexp_extract({url_expr}, '^[A-Za-z]+://([^/?#]*)', 1),
                 ':')[1]),
               '^www\\.', ''), '.') AS labels
    FROM u
  )"""


def url_normalize_sql(table: str = "documents") -> str:
    """Full oracle: fixture + normalization over ``table``."""
    return f"""
WITH u AS ({url_table_sql(table)})
{_norm_sql()}
"""


# ---------------------------------------------------------------------------
# canonical-URL dedup + domain report
# ---------------------------------------------------------------------------


def url_dedup(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical-URL duplicate groups: docs whose URLs normalize to the
    same canonical form (re-crawls through tracking links, http/https
    twins, www variants). One combinable groupBy over the 8-byte
    canonical hash — exact_dedup's scale shape; URL strings leave the
    scan only inside groups that matter (the min raw url per group for
    the report).

    Output: (norm_hash, norm_url, n_docs, n_distinct_raw, keep_doc_id)
    for groups of ≥ 2.
    """
    n = url_normalize(urls, url_col)
    return (
        n.groupBy(portable_hash60(F.col("norm_url")).alias("norm_hash"))
        .agg(
            F.min("norm_url").alias("norm_url"),
            F.count("*").alias("n_docs"),
            F.countDistinct("url").alias("n_distinct_raw"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def url_dedup_sql(table: str = "documents") -> str:
    h = portable_hash60_sql("norm_url")
    return f"""
WITH u AS ({url_table_sql(table)}),
n AS ({_norm_sql()})
SELECT {h} AS norm_hash,
       min(norm_url) AS norm_url,
       count(*) AS n_docs,
       count(DISTINCT url) AS n_distinct_raw,
       min(doc_id) AS keep_doc_id
FROM n GROUP BY 1 HAVING count(*) >= 2
"""


def domain_report(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per registrable domain with corpus share — the domain_cap
    pre-flight on web corpora (which hosts dominate the crawl). One
    combinable groupBy (exchange = |domains|) + a 1-row total
    broadcast."""
    from dataframeutils_spark.schema import decround

    n = url_normalize(urls, url_col)
    per = n.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    )
    tot = per.agg(F.sum("n_docs").alias("_t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "n_docs",
            "n_hosts",
            decround(F.col("n_docs") / F.col("_t")).alias("share"),
        )
    )


def domain_report_sql(table: str = "documents") -> str:
    from dataframeutils_spark.schema import decround_sql

    return f"""
WITH u AS ({url_table_sql(table)}),
n AS ({_norm_sql()}),
per AS (
  SELECT domain, count(*) AS n_docs,
         count(DISTINCT host) AS n_hosts
  FROM n GROUP BY domain
)
SELECT domain, n_docs, n_hosts,
       {decround_sql('n_docs / (SELECT sum(n_docs)::DOUBLE FROM per)')}
         AS share
FROM per
"""


_ASSET_EXTS = ("js", "css", "png", "jpg", "jpeg", "gif", "ico",
               "svg", "woff", "woff2")


def path_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain URL path-shape report: docs, path-depth
    distribution (avg/max), share of URLs still carrying query
    params after canonicalization, and the static-asset share
    (js/css/image/font extensions) — the crawl-hygiene screen that
    catches calendar traps (runaway depth), faceted-search explosions
    (high query share) and asset-heavy hosts that waste crawl budget
    before any text op runs.

    Output: (domain, n_docs, avg_depth, max_depth, query_pct,
    asset_pct).

    Scale shape: one projection on top of url_normalize's scan-side
    parse (path depth/extension from the SAME normalized URL both
    engines see) + one combinable groupBy — exchange = |domains|.
    """
    from dataframeutils_spark.schema import decround

    n = url_normalize(urls, url_col)
    path = F.regexp_extract(
        F.col("norm_url"), r"^[a-z]+://[^/?#]*([^?#]*)", 1
    )
    d = n.select(
        "domain",
        F.size(
            F.filter(F.split(path, "/"), lambda s: s != "")
        ).alias("depth"),
        (F.col("n_params_kept") > 0).cast("int").alias("has_q"),
        F.regexp_extract(path, r"\.([a-z0-9]+)$", 1).isin(
            list(_ASSET_EXTS)
        ).cast("int").alias("is_asset"),
    )
    return d.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        decround(F.avg("depth")).alias("avg_depth"),
        F.max("depth").cast("long").alias("max_depth"),
        decround(F.avg("has_q")).alias("query_pct"),
        decround(F.avg("is_asset")).alias("asset_pct"),
    )


def path_stats_sql(table: str = "documents") -> str:
    from dataframeutils_spark.schema import decround_sql

    exts = ", ".join(f"'{e}'" for e in _ASSET_EXTS)
    return f"""
WITH u AS ({url_table_sql(table)}),
n AS ({_norm_sql()}),
d AS (
  SELECT domain,
         len(list_filter(string_split(
           regexp_extract(norm_url, '^[a-z]+://[^/?#]*([^?#]*)', 1), '/'),
           s -> s <> '')) AS depth,
         CAST(n_params_kept > 0 AS INT) AS has_q,
         CAST(regexp_extract(
           regexp_extract(norm_url, '^[a-z]+://[^/?#]*([^?#]*)', 1),
           '\\.([a-z0-9]+)$', 1) IN ({exts}) AS INT) AS is_asset
  FROM n
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       {decround_sql('avg(depth)')} AS avg_depth,
       CAST(max(depth) AS BIGINT) AS max_depth,
       {decround_sql('avg(has_q)')} AS query_pct,
       {decround_sql('avg(is_asset)')} AS asset_pct
FROM d GROUP BY domain
"""
