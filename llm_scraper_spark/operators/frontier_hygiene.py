"""Frontier hygiene at crawl scale: trap detection, sitemap expansion,
robots gating as a checkable summary.

Three crawl-frontier operators a 10^10-URL crawler needs that the
reference handles implicitly (or not at all):

* **URL trap detection** — the reference crawls a curated seed list
  (``server/scripts/scrape_eccomerce.py:240-260`` walks a fixed
  category tree) so it never meets calendar pages, session-id loops or
  self-linking path cycles; an open-web frontier does, and an uncaught
  trap family can eat an arbitrary share of the politeness budget.
  ``url_trap_flags`` classifies every candidate URL with four row-local
  rules (path depth, repeated path segment, query-parameter count,
  session-id parameter) parsed back out of the URL string itself —
  pure JVM regexp/array expressions inside whole-stage codegen, zero
  shuffle, so the filter costs one scan at any corpus size.

* **Sitemap frontier expansion** — the scale analog of the reference's
  per-page ``<a href>`` harvest (``extract_product_urls.py:30-41``):
  parse ``<loc>`` entries out of sitemap XML, dedup the candidates
  corpus-wide (same page listed by many sitemaps), and anti-join the
  survivors against the already-crawled set before they enter the
  frontier.  The dedup groups and the anti-join key on the URL string;
  text never fans out.

* **Robots gate summary** — the crawl path gates fetches on a
  broadcast robots join (``operators/frontier.py``), which is
  pytest-covered but had no driver-checkable key.  Here the same shape
  (bounded per-host rule table, broadcast, prefix gate on the parsed
  first path segment) is exposed as a per-host allowed/blocked report.
  The rule table is bounded by the number of distinct hosts — a dim,
  not a corpus-scaling side — so the broadcast is correct at 100 TB.

All inputs are synthesized deterministically from ``documents`` with
integer arithmetic (the same CTE in each DuckDB twin), per the repo's
no-external-data discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# trap thresholds — shared constants quoted into both engines' SQL so
# the twins cannot drift
MAX_DEPTH = 6  # path segments before a URL is "too deep" (IRLbot-style)
MAX_PARAMS = 3  # query parameters before a URL is trap-suspect
SESSION_MARK = "sid="  # session-id parameter marker

#: page-id space for the synthetic sitemap universe — smaller than the
#: candidate count so cross-sitemap duplicates actually occur
PAGE_SPACE = 600

_PATH_RE = r"^https://[^/]+(/[^?]*)"
_QUERY_RE = r"\?(.*)$"
_HOST_RE = r"^https://([^/]+)/"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _frontier_url() -> "F.Column":
    """Deterministic messy-URL column over ``documents``: host bucket,
    ``doc_id``-driven path depth / segment values / query params, a
    session-id parameter on every 11th doc.  Segment ``i`` is
    ``p((doc_id*i) % 7)`` — so docs with ``doc_id % 7 == 0`` repeat one
    segment the whole way down (a self-link loop), and any path deeper
    than 7 segments repeats by pigeonhole: two natural trap families."""
    depth = F.col("doc_id") % 9 + 1
    segs = F.transform(
        F.sequence(F.lit(1), depth),
        lambda i: F.concat(F.lit("p"), ((F.col("doc_id") * i) % 7).cast("string")),
    )
    nq = F.col("doc_id") % 5
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (DuckDB's range(1, 1)
    # is empty) — guard the zero-param case explicitly
    params = F.when(nq == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), nq),
            lambda j: F.concat(F.lit("k"), j.cast("string"), F.lit("=v")),
        )
    )
    params = F.when(F.col("doc_id") % 11 == 0, F.concat(params, F.array(F.lit("sid=deadbeef")))).otherwise(params)
    host = F.concat(
        F.lit("s"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example.com"),
    )
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/"),
        F.array_join(segs, "/"),
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(F.lit("")),
    )


#: the frontier construction as a DuckDB CTE, kept in lockstep with
#: ``_frontier_url`` (the twin-drift guard is the gate itself)
_FRONTIER_CTE = """
        frontier AS (
          SELECT doc_id,
                 'https://s' || CAST(doc_id % 20 AS VARCHAR) || '.' || source ||
                 '.example.com' || '/' ||
                 array_to_string(
                   list_transform(range(1, CAST(doc_id % 9 AS INT) + 2),
                                  i -> 'p' || CAST((doc_id * i) % 7 AS VARCHAR)),
                   '/') ||
                 CASE WHEN (doc_id % 5) + (CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) > 0
                      THEN '?' || array_to_string(
                        CASE WHEN doc_id % 11 = 0
                             THEN list_append(
                               list_transform(range(1, CAST(doc_id % 5 AS INT) + 1),
                                              j -> 'k' || CAST(j AS VARCHAR) || '=v'),
                               'sid=deadbeef')
                             ELSE list_transform(range(1, CAST(doc_id % 5 AS INT) + 1),
                                                 j -> 'k' || CAST(j AS VARCHAR) || '=v')
                        END, '&')
                      ELSE '' END AS url
          FROM documents
        )
"""


def url_trap_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local crawler-trap classification of every frontier URL.

    The four rules are computed from the URL *string* (host/path/query
    re-parsed with the same regexps the crawl path uses), not from the
    generator's parameters — the detector has to work on URLs it did
    not mint.  All flags are JVM expressions; at 100 TB this is one
    codegen'd scan with the final sort belonging to the gate, not the
    operator."""
    docs = _docs(spark, sf_dir)
    url = _frontier_url()
    d = docs.select("doc_id", url.alias("url"))
    path = F.regexp_extract(F.col("url"), _PATH_RE, 1)
    query = F.regexp_extract(F.col("url"), _QUERY_RE, 1)
    segs = F.split(F.regexp_replace(path, r"^/", ""), "/")
    params = F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.split(query, "&")
    )
    d = d.select(
        "doc_id",
        "url",
        (F.size(segs) > MAX_DEPTH).cast("long").alias("trap_deep"),
        (F.size(segs) != F.size(F.array_distinct(segs)))
        .cast("long")
        .alias("trap_repeat"),
        (F.size(params) > MAX_PARAMS).cast("long").alias("trap_params"),
        F.col("url").contains(SESSION_MARK).cast("long").alias("trap_session"),
    )
    return d.withColumn(
        "is_trap",
        (
            (F.col("trap_deep") + F.col("trap_repeat") + F.col("trap_params") + F.col("trap_session"))
            > 0
        ).cast("long"),
    ).orderBy("doc_id")


def sitemap_frontier_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML → deduped, seen-filtered frontier candidates.

    Each document contributes a 3-entry ``<urlset>`` whose page ids
    land in a space smaller than the candidate count, so the same page
    URL is listed by many sitemaps; the dedup groupBy and the
    anti-join against the crawled set both key on the URL string —
    the XML text never shuffles."""
    docs = _docs(spark, sf_dir)
    entries = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda j: F.concat(
            F.lit("<url><loc>https://www.example.com/page/"),
            ((F.col("doc_id") * 2 + j) % PAGE_SPACE).cast("string"),
            F.lit("</loc></url>"),
        ),
    )
    xml = F.concat(F.lit("<urlset>"), F.array_join(entries, ""), F.lit("</urlset>"))
    cand = (
        docs.select("doc_id", xml.alias("xml"))
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("xml"), F.lit(r"<loc>([^<]*)</loc>"), 1)
            ).alias("url"),
        )
        .groupBy("url")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count("*").cast("long").alias("n_listings"),
        )
    )
    seen = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.concat(
                F.lit("https://www.example.com/page/"),
                (F.col("doc_id") % PAGE_SPACE).cast("string"),
            ).alias("url")
        )
        .distinct()
    )
    return cand.join(seen, "url", "left_anti").orderBy("url")


def robots_gate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host robots allow/block report over the synthetic frontier.

    The rule table is one row per distinct host (bounded — a dim), so
    ``broadcast`` is the correct join strategy at any corpus size; the
    gate compares the parsed first path segment against the host's
    disallowed segment, the same prefix discipline as the crawl path's
    robots join (operators/frontier.py)."""
    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", _frontier_url().alias("url"))
    host = F.regexp_extract(F.col("url"), _HOST_RE, 1)
    first_seg = F.element_at(
        F.split(
            F.regexp_replace(F.regexp_extract(F.col("url"), _PATH_RE, 1), r"^/", ""),
            "/",
        ),
        1,
    )
    fr = d.select(host.alias("host"), first_seg.alias("first_seg"))
    rules = (
        fr.select("host")
        .distinct()
        .withColumn(
            "deny_seg",
            F.concat(
                F.lit("p"),
                (F.regexp_extract(F.col("host"), r"^s(\d+)\.", 1).cast("long") % 7).cast(
                    "string"
                ),
            ),
        )
    )
    gated = fr.join(F.broadcast(rules), "host")
    return (
        gated.groupBy("host")
        .agg(
            F.sum((F.col("first_seg") != F.col("deny_seg")).cast("long")).alias(
                "n_allowed"
            ),
            F.sum((F.col("first_seg") == F.col("deny_seg")).cast("long")).alias(
                "n_blocked"
            ),
        )
        .orderBy("host")
    )


# ----------------------------------------------------- robots.txt codec
def robots_txt_col(
    disallow: str = "disallow_prefix", delay_ms: str = "crawl_delay_ms"
) -> str:
    """SQL expression rendering one host's rule row as a robots.txt
    body (the wire format a crawler actually fetches): empty Disallow
    = allow-all per the spec; Crawl-delay in seconds with exactly
    three decimals so both engines format the fraction identically
    (no locale/decimal-string drift)."""
    return (
        "concat("
        "'User-agent: *', chr(10),"
        f"'Disallow: ', coalesce({disallow}, ''), chr(10),"
        f"'Crawl-delay: ', cast({delay_ms} div 1000 as string), '.',"
        f" lpad(cast({delay_ms} % 1000 as string), 3, '0'), chr(10)"
        ")"
    )


def robots_parse_cols(txt: str = "robots_txt") -> list[str]:
    """SQL expressions parsing a robots.txt body back into the rule
    row the crawl's broadcast gate consumes — the missing hop between
    fetching /robots.txt bodies and `Crawler.init_state`'s rule
    table."""
    return [
        f"nullif(regexp_extract({txt}, 'Disallow: ([^\\n]*)', 1), '')"
        " AS disallow_prefix",
        f"cast(regexp_extract({txt}, 'Crawl-delay: ([0-9]+)\\\\.', 1)"
        " as bigint) * 1000"
        f" + cast(regexp_extract({txt}, 'Crawl-delay: [0-9]+\\\\.([0-9]{{3}})', 1)"
        " as bigint) AS crawl_delay_ms",
    ]


def robots_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate: deterministic md5-derived rules per synthetic
    host → rendered robots.txt → parsed back; ``roundtrip_ok`` is
    pinned to 1 in the twin, so any drift in renderer or parser in
    either engine fails the value hash.  All row-local over a
    |hosts|-row frame."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = docs.selectExpr("doc_id % 20 AS hk").distinct().selectExpr(
        "concat('site', cast(hk as string), '.example.com') AS host",
        "if(cast(conv(substr(md5(concat('rb:', hk)), 1, 2), 16, 10) as int)"
        " % 2 = 0, '/private', null) AS disallow_prefix",
        "250 + cast(conv(substr(md5(concat('rb:', hk)), 3, 2), 16, 10)"
        " as bigint) % 5 * 500 AS crawl_delay_ms",
    )
    rendered = rules.selectExpr(
        "host",
        "disallow_prefix AS want_disallow",
        "crawl_delay_ms AS want_delay",
        f"{robots_txt_col()} AS robots_txt",
    )
    return (
        rendered.selectExpr(
            "host", "want_disallow", "want_delay", *robots_parse_cols()
        )
        .selectExpr(
            "host",
            "disallow_prefix",
            "crawl_delay_ms",
            "if(coalesce(disallow_prefix, '') = coalesce(want_disallow, '')"
            " and crawl_delay_ms = want_delay, 1L, 0L) AS roundtrip_ok",
        )
        .orderBy("host")
    )


# -------------------------------------------------- registered domains
#: a miniature public-suffix table (the real PSL is ~10k rows — still
#: a broadcast at any corpus size, which is the point).  Multi-label
#: entries exercise the longest-match rule: "kyoto.jp" must beat "jp".
PSL = ["com", "org", "net", "co.uk", "org.uk", "jp", "kyoto.jp"]
#: synthetic host mix cycling through suffix families incl. multi-label
_PSL_HOSTS = [
    "shop{i}.example.com",
    "blog{i}.example.co.uk",
    "news{i}.example.org.uk",
    "wiki{i}.temple.kyoto.jp",
    "media{i}.example.jp",
]


def registered_domain_col(host: str = "host") -> str:
    """SQL expr fragments are not enough here — longest-match needs the
    suffix TABLE; see registered_domain_mix for the join form.  This
    helper returns the label array expression both sides build on."""
    return f"split({host}, '\\\\.')"


def registered_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll crawled hosts up to REGISTERED domains under public-suffix
    semantics: the effective TLD is the LONGEST suffix of the host
    present in the suffix table (so ``a.example.co.uk`` groups under
    ``example.co.uk``, not ``co.uk``/``uk``), and the registered
    domain is one label more.  This is the grouping level public
    crawl datasets publish (domain graphs, per-domain budgets) — a
    naive "last two labels" rollup misclassifies every ccTLD host.

    Scale shape: each host explodes into its label-suffixes (≤ label
    count, bounded by hostname syntax), equi-joins the BROADCAST
    suffix table (the full PSL is ~10k fixed rows), and a per-host
    max-length pick resolves longest-match — row-bounded window.
    Output: per registered domain, host and page counts."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    pages = docs.selectExpr(
        "doc_id",
        "concat(" + ", ".join(
            f"if(doc_id % {len(_PSL_HOSTS)} = {i},"
            f" concat('{t.split('{i}')[0]}', cast(doc_id % 7 as string),"
            f" '{t.split('{i}')[1]}'), '')"
            for i, t in enumerate(_PSL_HOSTS)
        ) + ") AS host",
    )
    suffixes = spark.createDataFrame(
        [(s, len(s.split("."))) for s in PSL], "suffix string, n_labels int"
    )
    cand = pages.selectExpr(
        "doc_id",
        "host",
        f"size({registered_domain_col()}) AS n_host_labels",
        f"explode(transform(sequence(1, size({registered_domain_col()})),"
        f" k -> array_join(slice({registered_domain_col()},"
        f" size({registered_domain_col()}) - k + 1, k), '.'))) AS cand_sfx",
    ).join(
        F.broadcast(suffixes),
        F.col("cand_sfx") == F.col("suffix"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_labels"))
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        # registered domain = suffix plus one more label
        .selectExpr(
            "doc_id",
            "host",
            "if(n_host_labels > n_labels,"
            " array_join(slice(split(host, '\\\\.'),"
            " n_host_labels - n_labels, n_labels + 1), '.'),"
            " host) AS reg_domain",
        )
    )
    return (
        best.groupBy("reg_domain")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count("*").cast("long").alias("n_pages"),
        )
        .orderBy("reg_domain")
    )


# ------------------------------------------------------ redirect chains
#: pointer-doubling rounds: resolves chains up to 2^ROUNDS hops —
#: covers the synthetic 15-hop worst case with one round to spare
RED_ROUNDS = 4
RED_BLOCK = 16  # synthetic chain block: 16k+j → 16k+j−1, 16k is final


def resolve_redirects(edges: DataFrame, rounds: int = RED_ROUNDS) -> DataFrame:
    """Resolve every redirect source to its FINAL target with hop
    count, by pointer doubling: each round self-joins the current
    pointer table on (my target = your source), composing pointers so
    resolved depth doubles per round — chains up to 2^rounds hops
    settle in `rounds` O(edges) equi-joins, the standard log-round
    trick (same family as dedup.py's large-star/small-star CC).  A
    3xx-heavy crawl needs this: fetch the final spelling once, credit
    every alias (RFC 9110 allows chains; real crawls see 5-10 hops).

    Raises on non-convergence (a pointer still lands on a source
    after `rounds` doublings: an over-long chain or a redirect LOOP)
    rather than returning partial targets — same contract as
    dedup_clusters.  Input ``(src, dst)``; output ``(url_id,
    final_id, hops)``."""
    ptr = edges.select("src", "dst", F.lit(1).cast("long").alias("hops"))
    for _ in range(rounds):
        nxt = ptr.selectExpr(
            "src AS j_src", "dst AS j_dst", "hops AS j_hops"
        )
        ptr = (
            ptr.join(nxt, ptr.dst == nxt.j_src, "left")
            .selectExpr(
                "src",
                "coalesce(j_dst, dst) AS dst",
                "hops + coalesce(j_hops, 0L) AS hops",
            )
            .localCheckpoint(eager=True)
        )
    unresolved = (
        ptr.join(
            edges.select(F.col("src").alias("chk")).distinct(),
            ptr.dst == F.col("chk"),
            "left_semi",
        ).limit(1).count()
    )
    if unresolved:
        raise RuntimeError(
            "redirect chain longer than 2^rounds hops or a redirect "
            "loop — raise rounds or break the cycle"
        )
    return ptr.selectExpr("src AS url_id", "dst AS final_id", "hops")


def redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: resolve the synthetic per-block redirect chains
    (16k+j → 16k+j−1 → … → 16k); by construction hops == url_id −
    final_id, which the twin certifies value-by-value."""
    edges = (
        _docs(spark, sf_dir)
        .filter(F.expr(f"doc_id % {RED_BLOCK} <> 0"))
        .selectExpr("doc_id AS src", "doc_id - 1 AS dst")
    )
    return resolve_redirects(edges).orderBy("url_id")


_PSL_HOST_DUCK = "CASE CAST(doc_id % 5 AS INT) " + " ".join(
    f"WHEN {i} THEN '{t.split('{i}')[0]}' || (doc_id % 7)"
    f" || '{t.split('{i}')[1]}'"
    for i, t in enumerate(_PSL_HOSTS[:-1])
) + (
    f" ELSE '{_PSL_HOSTS[-1].split('{i}')[0]}' || (doc_id % 7)"
    f" || '{_PSL_HOSTS[-1].split('{i}')[1]}' END"
)

_PSL_DUCK = ", ".join(
    f"('{s}', {len(s.split('.'))})" for s in PSL
)

ORACLE_SQL = {
    "registered_domain_mix": f"""
        WITH pages AS (
          SELECT doc_id, {_PSL_HOST_DUCK} AS host FROM documents),
        lab AS (
          SELECT doc_id, host, string_split(host, '.') AS labels
          FROM pages),
        cand AS (
          SELECT doc_id, host, len(labels) AS n_host_labels,
                 array_to_string(
                   labels[len(labels) - k + 1 : len(labels)], '.') AS cand_sfx
          FROM lab CROSS JOIN (SELECT unnest(range(1, 8)) AS k) t
          WHERE k <= len(labels)),
        sfx AS (SELECT * FROM (VALUES {_PSL_DUCK}) s(suffix, n_labels)),
        j AS (
          SELECT c.doc_id, c.host, c.n_host_labels, s.n_labels
          FROM cand c JOIN sfx s ON c.cand_sfx = s.suffix),
        best AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY n_labels DESC) AS rk
          FROM j),
        reg AS (
          SELECT doc_id, host,
                 CASE WHEN n_host_labels > n_labels
                      THEN array_to_string(
                        string_split(host, '.')
                          [n_host_labels - n_labels : n_host_labels], '.')
                      ELSE host END AS reg_domain
          FROM best WHERE rk = 1)
        SELECT reg_domain,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               CAST(count(*) AS BIGINT) AS n_pages
        FROM reg GROUP BY reg_domain ORDER BY reg_domain
    """,
    "redirect_resolve": f"""
        WITH r0 AS (
          SELECT doc_id AS src, doc_id - 1 AS dst, CAST(1 AS BIGINT) AS hops
          FROM documents WHERE doc_id % {RED_BLOCK} <> 0),
        {",".join(
            f'''r{i} AS (
          SELECT a.src, coalesce(b.dst, a.dst) AS dst,
                 a.hops + coalesce(b.hops, 0) AS hops
          FROM r{i - 1} a LEFT JOIN r{i - 1} b ON a.dst = b.src)'''
            for i in range(1, RED_ROUNDS + 1)
        )}
        SELECT src AS url_id, dst AS final_id, CAST(hops AS BIGINT) AS hops
        FROM r{RED_ROUNDS} ORDER BY url_id
    """,
    "robots_roundtrip": """
        WITH rules AS (
          SELECT 'site' || hk || '.example.com' AS host,
                 CASE WHEN CAST(concat('0x', substr(md5('rb:' || hk), 1, 2))
                           AS BIGINT) % 2 = 0
                      THEN '/private' END AS disallow_prefix,
                 250 + CAST(concat('0x', substr(md5('rb:' || hk), 3, 2))
                            AS BIGINT) % 5 * 500 AS crawl_delay_ms
          FROM (SELECT DISTINCT doc_id % 20 AS hk FROM documents)
        )
        SELECT host, disallow_prefix,
               CAST(crawl_delay_ms AS BIGINT) AS crawl_delay_ms,
               CAST(1 AS BIGINT) AS roundtrip_ok
        FROM rules ORDER BY host
    """,
    "url_trap_flags": f"""
        WITH {_FRONTIER_CTE},
        parsed AS (
          SELECT doc_id, url,
                 string_split(ltrim(regexp_extract(url, '^https://[^/]+(/[^?]*)', 1), '/'), '/') AS segs,
                 regexp_extract(url, '\\?(.*)$', 1) AS q
          FROM frontier
        )
        SELECT doc_id, url,
               CAST(CASE WHEN len(segs) > {MAX_DEPTH} THEN 1 ELSE 0 END AS BIGINT) AS trap_deep,
               CAST(CASE WHEN len(segs) <> len(list_distinct(segs)) THEN 1 ELSE 0 END AS BIGINT) AS trap_repeat,
               CAST(CASE WHEN q <> '' AND len(string_split(q, '&')) > {MAX_PARAMS} THEN 1 ELSE 0 END AS BIGINT) AS trap_params,
               CAST(CASE WHEN contains(url, '{SESSION_MARK}') THEN 1 ELSE 0 END AS BIGINT) AS trap_session,
               CAST(CASE WHEN len(segs) > {MAX_DEPTH}
                          OR len(segs) <> len(list_distinct(segs))
                          OR (q <> '' AND len(string_split(q, '&')) > {MAX_PARAMS})
                          OR contains(url, '{SESSION_MARK}')
                         THEN 1 ELSE 0 END AS BIGINT) AS is_trap
        FROM parsed ORDER BY doc_id
    """,
    "sitemap_frontier_extract": f"""
        WITH sitemaps AS (
          SELECT doc_id,
                 '<urlset>' || array_to_string(
                   list_transform(range(0, 3),
                     j -> '<url><loc>https://www.example.com/page/' ||
                          CAST((doc_id * 2 + j) % {PAGE_SPACE} AS VARCHAR) ||
                          '</loc></url>'),
                   '') || '</urlset>' AS xml
          FROM documents
        ),
        cand AS (
          SELECT url, min(doc_id) AS first_doc,
                 CAST(count(*) AS BIGINT) AS n_listings
          FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS url
            FROM sitemaps
          ) GROUP BY url
        ),
        seen AS (
          SELECT DISTINCT 'https://www.example.com/page/' ||
                 CAST(doc_id % {PAGE_SPACE} AS VARCHAR) AS url
          FROM documents WHERE doc_id % 2 = 0
        )
        SELECT c.url, c.first_doc, c.n_listings
        FROM cand c ANTI JOIN seen s ON c.url = s.url
        ORDER BY c.url
    """,
    "robots_gate_summary": f"""
        WITH {_FRONTIER_CTE},
        fr AS (
          SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
                 (string_split(ltrim(regexp_extract(url, '^https://[^/]+(/[^?]*)', 1), '/'), '/'))[1] AS first_seg
          FROM frontier
        ),
        rules AS (
          SELECT host,
                 'p' || CAST(CAST(regexp_extract(host, '^s(\\d+)\\.', 1) AS BIGINT) % 7 AS VARCHAR) AS deny_seg
          FROM (SELECT DISTINCT host FROM fr)
        )
        SELECT f.host,
               CAST(sum(CASE WHEN f.first_seg <> r.deny_seg THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
               CAST(sum(CASE WHEN f.first_seg = r.deny_seg THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
        FROM fr f JOIN rules r ON f.host = r.host
        GROUP BY f.host ORDER BY f.host
    """,
}

QUERIES = {
    "registered_domain_mix": registered_domain_mix,
    "redirect_resolve": redirect_resolve,
    "robots_roundtrip": robots_roundtrip,
    "url_trap_flags": url_trap_flags,
    "sitemap_frontier_extract": sitemap_frontier_extract,
    "robots_gate_summary": robots_gate_summary,
}
