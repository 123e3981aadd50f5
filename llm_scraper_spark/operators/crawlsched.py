"""Crawl-scheduler analytics: DUST rule mining, HITS link analysis,
change-rate-driven recrawl scheduling.

Three operators a 10^10-URL frontier needs that the reference's
fixed-seed loop (server/scripts/scrape_eccomerce.py:240-260 walks a
curated category tree; extract_product_urls.py:30-41 re-fetches
whatever URL string it sees) never has to solve:

* **DUST rule mining** (`dust_rules`) — "Different URLs, Similar Text"
  (Bar-Yossef et al., WWW'07): an open crawl meets the same page under
  many spellings (``…/`` vs ``…/index.html``, http vs https, session
  params).  Canonicalizing them BEFORE the fetch is worth a large
  fraction of the politeness budget.  Rules are mined from evidence
  the crawl already has: pairs of distinct URLs whose fetched content
  fingerprint is identical.  For each pair, the longest common
  prefix/suffix split yields a substitution rule (α → β); rules are
  aggregated corpus-wide and kept at ``support ≥ MIN_SUPPORT`` (one-off
  middles — e.g. two unrelated pages with colliding text — die there,
  exactly the paper's noise filter).  Scale shape: URLs join on a
  16-byte content key, content groups are capped at ``MAX_ALIASES``
  (the boilerplate-page guard — same discipline as dedup.MAX_BUCKET),
  and the per-pair lcp/lcs is row-local codegen over ~60-char strings.

* **HITS hubs/authorities** (`hits_topk`) — the second classic
  crawl-priority signal next to PageRank (`graph.link_pagerank`): a
  good *hub* page is worth fetching because its outlinks are good.
  Fixed-point integers with per-iteration max-rescaling (x·SCALE div
  max(x)) instead of an L2 norm — order-independent, overflow-bounded
  (scores ≤ SCALE, sums ≤ in-degree·SCALE), and bit-identical in both
  engines.  Per iteration: two O(edges) equi-join + sum passes and two
  1-row max aggregates; score state never on the driver.  The
  deterministic ``vid div 2`` edge map is 2-to-1, so in-degrees vary
  and the fixpoint is non-trivial (a bijective map would make HITS
  uniform).

* **Recrawl scheduling** (`recrawl_schedule`) — Cho & Garcia-Molina's
  freshness result: revisit frequency should track each page's
  observed change rate.  Over a revisit log (events: one row per
  observation, ``event_type <> 'view'`` = "page changed since last
  visit"), estimate the change rate per URL and derive the next fetch
  slot: ``interval = BASE_H·(n_obs+1) div (n_changes+1)`` clamped to
  [1 h, MAX_H] — the linearized (division-free-log) form of the
  Poisson estimator, integer-exact in both engines.  One groupBy over
  the log; output is one row per URL.

* **Crawl-budget allocation** (`crawl_budget_allocation`) — divide a
  round's global politeness budget (G URL fetches) across hosts in
  proportion to their `graph.domain_rank` score with EXACT total: the
  Hamilton / largest-remainder apportionment.  ``base_i = G·r_i div
  Σr`` floors every share; the ``G − Σbase`` leftover units go to the
  hosts with the largest division remainders (ties broken on host id)
  — so ``Σ budget_i == G`` exactly, every budget is ``base`` or
  ``base+1``, and both engines agree bit-for-bit because nothing is
  rounded in floating point.  Scale shape: one scalar-total broadcast
  + a bucketed two-phase top-L pick (histogram collect bounded at
  BUDGET_BUCKETS rows; the only window is partitioned by bucket), so
  no single task ever ranks the full host set.

All synthetic inputs derive from ``documents``/``events`` with integer
arithmetic mirrored in the DuckDB twins (no external data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ------------------------------------------------------------------ DUST
MAX_ALIASES = 16   # content-group cap: a boilerplate page shared by
                   # millions of URLs must not go quadratic in the pair join
MIN_SUPPORT = 3    # rules seen fewer times are pair noise, not rules
N_SITES = 20       # synthetic host buckets
#: host extraction for the rule key — identical regex in both engines
HOST_RE = "^[a-z]+://([^/]+)"

# ------------------------------------------------------------------ HITS
HITS_SCALE = 1_000_000
HITS_ITERS = 3
HITS_FANOUT = 4

# --------------------------------------------------------------- recrawl
RC_SCALE = 1_000_000   # change-rate fixed-point denominator
RC_BASE_H = 24         # a never-changing page starts at ~daily revisit
RC_MAX_H = 672         # never schedule further out than 4 weeks


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- dust
#: canonical URL + the three alias families the miner should learn:
#: trailing index.html, http-for-https, a session-id query parameter
_CANON = (
    "concat('https://site', cast(doc_id % {n} as string),"
    " '.example.com/page/', cast(doc_id as string), '/')"
).format(n=N_SITES)

_ALIAS_SQL = [
    # (predicate on doc_id, url expression)
    ("true", _CANON),
    ("doc_id % 3 = 0", f"concat({_CANON}, 'index.html')"),
    ("doc_id % 4 = 0", f"replace({_CANON}, 'https://', 'http://')"),
    ("doc_id % 5 = 0", f"concat({_CANON}, '?sid=abc123')"),
]


def _alias_urls(docs: DataFrame) -> DataFrame:
    """(ckey, url): every spelling of every page, keyed by the 16-byte
    content fingerprint the crawl's fetch output already carries."""
    parts = [
        docs.filter(F.expr(pred)).selectExpr(
            "md5(text) AS ckey", f"{url} AS url"
        )
        for pred, url in _ALIAS_SQL
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (alpha → beta) URL substitution rules from same-content URL
    pairs; keep rules with support ≥ MIN_SUPPORT.

    The pair join is bounded: content groups capped at MAX_ALIASES
    (window count on the 16-byte join key — no extra shuffle beyond
    the group-by the join needs anyway), and the lcp/lcs middle
    extraction is a row-local ``aggregate(sequence(...))`` over the
    two URL strings (prefix equality is monotone, so the count of
    equal prefixes IS the lcp) — O(L²) char compares on ~60-char URLs,
    all inside whole-stage codegen."""
    from pyspark.sql import Window

    urls = _alias_urls(_docs(spark, sf_dir))
    urls = urls.withColumn(
        "gsz", F.count("*").over(Window.partitionBy("ckey"))
    ).filter(F.col("gsz") <= MAX_ALIASES)
    # shuffle_hash, NOT broadcast: both sides are the full URL universe
    # (grows with the corpus — a broadcast hint would be obeyed
    # unconditionally and OOM at 10^10 URLs); the equi-join on the
    # 16-byte ckey is co-partitioned with the window count above, so
    # the exchange is reused, and the capped group size bounds the
    # within-key pair fan-out.
    pairs = (
        urls.alias("x")
        .join(
            urls.hint("shuffle_hash").alias("y"),
            F.expr("x.ckey = y.ckey AND x.url < y.url"),
        )
        .selectExpr("x.url AS ua", "y.url AS ub")
    )
    mid = pairs.selectExpr(
        "ua",
        "ub",
        "length(ua) AS la",
        "length(ub) AS lb",
        "least(length(ua), length(ub)) AS m",
    ).selectExpr(
        "ua",
        "ub",
        "la",
        "lb",
        "aggregate(sequence(1, m), 0L,"
        " (acc, i) -> acc + if(substr(ua, 1, i) = substr(ub, 1, i), 1L, 0L))"
        " AS lcp",
        "aggregate(sequence(1, m), 0L,"
        " (acc, i) -> acc + if(substr(ua, la - i + 1, i)"
        "                    = substr(ub, lb - i + 1, i), 1L, 0L))"
        " AS lcs_raw",
        "m",
    ).selectExpr(
        "ua", "ub", "la", "lb", "lcp",
        # prefix and suffix may not overlap (…/a/ vs …/a/a/ shares more
        # than the string length in prefix+suffix terms)
        "least(lcs_raw, m - lcp) AS lcs",
    )
    return (
        mid.selectExpr(
            f"regexp_extract(ua, '{HOST_RE}', 1) AS host",
            f"regexp_extract(ub, '{HOST_RE}', 1) AS host_b",
            "substr(ua, cast(lcp + 1 as int), cast(la - lcp - lcs as int))"
            " AS alpha",
            "substr(ub, cast(lcp + 1 as int), cast(lb - lcp - lcs as int))"
            " AS beta",
        )
        # DUST rules are mined WITHIN a site family (Bar-Yossef §3):
        # a same-content pair straddling two hosts is a mirror, not a
        # spelling rule — and the host key is what lets `dust_apply`
        # equi-join instead of broadcasting every rule to every URL
        .filter(F.col("host") == F.col("host_b"))
        .groupBy("host", "alpha", "beta")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
        .orderBy(F.desc("support"), "host", "alpha", "beta")
    )


# ---------------------------------------------------------------- hits
def hits_scores(docs: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """Hub/authority fixed point over the deterministic 2-to-1 link
    graph (dst = (vid div 2 + 17·j) mod n, j = 1..HITS_FANOUT).  The
    kernel consumes any (src, dst) edge table — the synthetic map only
    constructs test edges, exactly as in graph.link_pagerank.

    Lineage discipline: the rescale step reads each raw vector TWICE
    (once for the values, once for the 1-row max), so the logical plan
    doubles per branch and compounds to 2^(2·iters) leaves — lazy
    persists do NOT cap the *planner* cost, and Catalyst/AQE choked on
    the tree (minutes of treeString/codegen at sf0.001, measured).
    Each per-iteration raw vector is therefore **eagerly
    localCheckpoint-ed** — one 16-byte row per vertex, tiny at any
    scale — which truncates lineage to constant depth, exactly the
    discipline `dedup.dedup_clusters` uses for its iterative closure
    (recompute-on-executor-loss is acceptable for derived state that
    one O(edges) pass rebuilds).  `edges`/`idx` are persisted once
    because every iteration re-reads them."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("vid"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = idx.count()  # scalar graph size — bounded driver value
    if n == 0:
        return docs.select(
            "doc_id",
            F.lit(0).cast("long").alias("auth_units"),
            F.lit(0).cast("long").alias("hub_units"),
        ).limit(0)
    edges = idx.select(
        F.col("vid").alias("src"),
        F.explode(
            F.array(
                *[
                    (F.expr("vid div 2") + F.lit(17 * j)) % n
                    for j in range(1, HITS_FANOUT + 1)
                ]
            )
        ).alias("dst"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hub = idx.select("vid", F.lit(HITS_SCALE).cast("long").alias("h"))
    auth = None
    for _ in range(iters):
        a_raw = (
            edges.join(hub, edges.src == hub.vid)
            .groupBy("dst")
            .agg(F.sum("h").alias("r"))
        )
        a_raw = idx.select("vid").join(
            a_raw, idx.vid == a_raw.dst, "left"
        ).select(
            "vid", F.coalesce(F.col("r"), F.lit(0)).cast("long").alias("r")
        ).localCheckpoint(eager=True)
        amax = a_raw.agg(F.greatest(F.max("r"), F.lit(1)).alias("mx"))
        auth = a_raw.crossJoin(F.broadcast(amax)).selectExpr(
            "vid", f"r * {HITS_SCALE}L div mx AS a"
        )
        h_raw = (
            edges.join(auth, edges.dst == auth.vid)
            .groupBy("src")
            .agg(F.sum("a").alias("r"))
        )
        h_raw = idx.select("vid").join(
            h_raw, idx.vid == h_raw.src, "left"
        ).select(
            "vid", F.coalesce(F.col("r"), F.lit(0)).cast("long").alias("r")
        ).localCheckpoint(eager=True)
        hmax = h_raw.agg(F.greatest(F.max("r"), F.lit(1)).alias("mx"))
        hub = h_raw.crossJoin(F.broadcast(hmax)).selectExpr(
            "vid", f"r * {HITS_SCALE}L div mx AS h"
        )
    return (
        idx.join(auth, "vid")
        .join(hub, "vid")
        .select(
            "doc_id",
            F.col("a").alias("auth_units"),
            F.col("h").alias("hub_units"),
        )
    )


def hits_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: top-20 authorities (fetch-priority signal),
    deterministic tie-break on doc_id."""
    docs = _docs(spark, sf_dir).select("doc_id")
    return (
        hits_scores(docs)
        .orderBy(F.desc("auth_units"), F.asc("doc_id"))
        .limit(20)
    )


# ------------------------------------------------------------- recrawl
def recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL revisit schedule from the observation log: change rate
    (fixed-point), next revisit interval, absolute next-fetch epoch.
    One groupBy over the log — O(observations) shuffle of 8-byte keys,
    output one row per URL."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.selectExpr(
            "user_id AS url_id",
            "if(event_type <> 'view', 1L, 0L) AS changed",
            "unix_timestamp(ts) AS epoch_s",
        )
        .groupBy("url_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("changed").cast("long").alias("n_changes"),
            F.max("epoch_s").cast("long").alias("last_seen_epoch"),
        )
        .selectExpr(
            "url_id",
            "n_obs",
            "n_changes",
            "last_seen_epoch",
            f"n_changes * {RC_SCALE}L div n_obs AS change_rate_units",
            f"least({RC_MAX_H}L, greatest(1L,"
            f" {RC_BASE_H}L * (n_obs + 1) div (n_changes + 1)))"
            " AS next_interval_h",
        )
        .selectExpr(
            "url_id",
            "n_obs",
            "n_changes",
            "change_rate_units",
            "next_interval_h",
            "last_seen_epoch + next_interval_h * 3600 AS next_fetch_epoch",
        )
        .orderBy("url_id")
    )


# ------------------------------------------------------------ DUST apply
#: minimum rewrite-context length: 1-char middles (the http/https 's')
#: are real DUST output but unsafe for context-free string replace —
#: scheme normalization is the URL canonicalizer's job
#: (functions/urls.py); the paper's full system keeps positional
#: context per rule, this operator keeps only rules whose middle is
#: long enough to be positionally unambiguous.
DUST_MIN_BETA = 4


def apply_dust_rules(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Canonicalize ``urls (url, host)`` with ``rules (host, alpha,
    beta, support)``: per URL the highest-support applicable rule
    (support desc, alpha, beta tie-break) rewrites ``beta → alpha``;
    URLs matching no rule pass through.

    Scale shape: rules are mined per site family, so the rule table
    grows with HOSTS — never broadcast it.  The join is a shuffle-hash
    EQUI-join on host with ``contains(url, beta)`` as the residual
    predicate: each URL meets only its own site's rules (per-URL cost
    O(rules-per-host), not O(all rules)), and a template-heavy host is
    one shuffle key, not a replicated build side.  The best-rule pick
    is a window partitioned by url (group size = that host's matching
    rules)."""
    from pyspark.sql import Window

    cand = (
        urls.alias("u")
        .join(
            rules.hint("shuffle_hash").alias("r"),
            F.expr("u.host = r.host AND contains(u.url, r.beta)"),
            "left",
        )
        .select("u.url", "r.alpha", "r.beta", "r.support")
    )
    w = Window.partitionBy("url").orderBy(
        F.expr("coalesce(support, -1L)").desc(), F.asc("alpha"), F.asc("beta")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "url",
            "if(beta IS NOT NULL, replace(url, beta, alpha), url)"
            " AS canon_url",
            "beta IS NOT NULL AS rewritten",
        )
        .orderBy("url")
    )


def dust_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the mined DUST rules back to the URL universe — the
    second half of Bar-Yossef's loop (mine on round N's fetch output,
    canonicalize round N+1's frontier BEFORE fetching).  Gate shell
    over `apply_dust_rules`."""
    rules = dust_rules(spark, sf_dir).filter(
        F.length("beta") >= DUST_MIN_BETA
    )
    urls = (
        _alias_urls(_docs(spark, sf_dir))
        .select("url")
        .distinct()
        .selectExpr("url", f"regexp_extract(url, '{HOST_RE}', 1) AS host")
    )
    return apply_dust_rules(urls, rules)


# ---------------------------------------------------------- crawl budget
BUDGET_G = 10_000  # URL fetches per round to apportion across hosts
#: remainder-histogram width for the two-phase leftover pick: the
#: driver collect is bounded at this many rows and the only window in
#: the plan is partitioned by bucket (~#hosts/B rows each on a
#: non-degenerate remainder distribution)
BUDGET_BUCKETS = 1024


def allocate_budget(ranked: DataFrame, total_budget: int) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of ``total_budget``
    units over a ``(host, rank_units)`` frame: floor shares first,
    then one unit each to the largest remainders until the total is
    exact.  All-integer, deterministic (remainder desc, host asc).

    Scale shape (the r3 fix): the leftover L = G − Σbase is a scalar
    < #hosts, but ranking EVERY host globally to find the top-L
    remainders funnels the whole host set through one task
    ("No Partition Defined for Window").  Two-phase selection instead:
    (1) a BUDGET_BUCKETS-wide histogram of the remainder range — one
    hash agg, driver collect bounded at B rows — locates the threshold
    bucket t and how many units it must still supply; (2) hosts in
    buckets above t take +1 outright, and only bucket t is ranked
    (window PARTITIONED by bucket, ~#hosts/B rows).  Remainder-tied
    hosts concentrate in one bucket in the worst case — the window
    then sees that tie class only, never the full host set."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    totals = ranked.agg(
        F.sum("rank_units").cast("long").alias("total_rank")
    )
    based = (
        ranked.crossJoin(F.broadcast(totals))
        .filter(F.col("total_rank") > 0)
        .selectExpr(
            "host",
            "rank_units",
            f"{total_budget}L * rank_units div total_rank AS base",
            f"({total_budget}L * rank_units) % total_rank AS rem",
            f"({total_budget}L * rank_units) % total_rank"
            f" * {BUDGET_BUCKETS}L div total_rank AS bkt",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # two bounded driver collects: the 1-row leftover scalar and the
    # ≤B-row remainder histogram (same discipline as the other
    # bounded collects audited in r3)
    row = based.agg(
        (F.lit(total_budget) - F.sum("base")).cast("long").alias("left")
    ).collect()[0]
    leftover = row["left"]
    if leftover is None:  # empty input or total_rank == 0
        out = based.selectExpr(
            "host", "rank_units", "base AS budget"
        ).localCheckpoint(eager=True)
        based.unpersist()
        return out
    hist = {
        r["bkt"]: r["n"]
        for r in based.groupBy("bkt").agg(F.count("*").alias("n")).collect()
    }
    n_above, thresh, need = 0, BUDGET_BUCKETS, 0
    for b in sorted(hist, reverse=True):
        if n_above + hist[b] >= leftover:
            thresh, need = b, leftover - n_above
            break
        n_above += hist[b]
    w = Window.partitionBy("bkt").orderBy(F.desc("rem"), F.asc("host"))
    # eager localCheckpoint materializes the result (reading `based`
    # from its cache once) so `based` can be unpersisted HERE instead
    # of leaking one cached per-host frame per invocation (r4 ADVICE);
    # the caller gets a lineage-free frame, one row per host
    out = (
        based.withColumn("rk", F.row_number().over(w).cast("long"))
        .selectExpr(
            "host",
            "rank_units",
            f"base + if(bkt > {thresh}L OR"
            f" (bkt = {thresh}L AND rk <= {need}L), 1L, 0L) AS budget",
        )
        .localCheckpoint(eager=True)
    )
    based.unpersist()
    return out


def crawl_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: apportion BUDGET_G fetches across the host graph
    by domain rank; Σbudget == BUDGET_G exactly."""
    from llm_scraper_spark.operators.graph import domain_rank

    ranked = domain_rank(spark, sf_dir)
    return allocate_budget(ranked, BUDGET_G).orderBy("host")


# ------------------------------------------------------ token bucket
TB_CAP = 5      # bucket capacity (max burst per host)
TB_REFILL = 3   # tokens refilled per elapsed slot
TB_SLOT_S = 60  # slot width (seconds)


def token_bucket_fold(requests: DataFrame) -> DataFrame:
    """Per-host token-bucket admission over a slotted request log —
    the crawler's politeness budget as an auditable ledger: slot k
    starts with ``min(CAP, tokens_after_prev + elapsed_slots·REFILL)``
    tokens (gap-aware refill: idle slots accumulate, capped), admits
    ``min(arrivals, tokens)``, drops the rest.  A per-host SEQUENTIAL
    recurrence — the one shape neither a closed-form window nor a
    fixed unroll expresses — so it runs as applyInPandas: hosts
    hash-partition across the cluster, each host's slot history folds
    in one Arrow-batched vectorized pass (state = one int, never on
    the driver).  The DuckDB twin is a genuine RECURSIVE CTE over the
    same recurrence, so both engines walk the identical integer fold.

    Input ``(host, slot, arrivals)`` (one row per host×slot with
    traffic); output adds ``admitted, dropped, tokens_after``."""
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slot").reset_index(drop=True)
        tokens = TB_CAP
        prev_slot = None
        adm, drp, left = [], [], []
        for slot, arr in zip(pdf["slot"], pdf["arrivals"]):
            if prev_slot is not None:
                tokens = min(TB_CAP, tokens + (slot - prev_slot) * TB_REFILL)
            a = min(arr, tokens)
            tokens -= a
            adm.append(a)
            drp.append(arr - a)
            left.append(tokens)
            prev_slot = slot
        pdf["admitted"] = adm
        pdf["dropped"] = drp
        pdf["tokens_after"] = left
        return pdf

    return requests.groupBy("host").applyInPandas(
        fold,
        "host long, slot long, arrivals long, admitted long,"
        " dropped long, tokens_after long",
    )


def rate_limit_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: token-bucket admission of the event stream slotted
    per minute, host = user_id mod N_SITES."""
    reqs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            f"user_id % {N_SITES} AS host",
            f"cast(floor(unix_timestamp(ts) / {TB_SLOT_S}) as long) AS slot",
        )
        .groupBy("host", "slot")
        .agg(F.count("*").cast("long").alias("arrivals"))
    )
    return token_bucket_fold(reqs).orderBy("host", "slot")


# --------------------------------------------------------------- anchors
ANCHOR_TOPK = 3
ANCHOR_FANOUT = 4


def anchor_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target in-link anchor-text aggregation — the classic
    web-search relevance signal (anchor terms describe the TARGET
    page better than its own text; the reference's extractor only
    ever reads the page itself, extract_product_urls.py:104-119 walks
    hrefs but discards the link text).  For every link (src → dst)
    the anchor term is the link-position-th word of the source page
    (deterministic, twin-exact); per target we keep the top-k terms
    by count (count desc, term asc tie-break) plus the total in-link
    count.

    Scale shape: anchors are O(edges) skinny (dst, term) rows; the
    (dst, term) count agg collapses them before the per-dst top-k
    window, whose input is bounded by the target's distinct anchor
    VOCABULARY (not its in-degree — a hub with 10^7 identical
    "click here" anchors contributes one row).  One shuffle for the
    agg, one for the window, both on the dst key."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("vid"),
    )
    n = idx.count()  # scalar graph size (construction-only, as PageRank)
    if n == 0:
        return spark.createDataFrame(
            [], "doc_id long, term string, n long, in_links long"
        )
    # (src_vid, dst_vid, link position j); anchor term = j-th word of src
    links = idx.select(
        F.col("vid").alias("src"),
        F.posexplode(
            F.array(
                *[
                    (F.col("vid") * 31 + F.lit(j)) % n
                    for j in range(1, ANCHOR_FANOUT + 1)
                ]
            )
        ).alias("pos", "dst"),
    )
    src_text = idx.join(docs, "doc_id").select("vid", "text")
    anchors = (
        links.join(src_text, links.src == src_text.vid)
        .selectExpr(
            "dst",
            "lower(element_at(split(text, ' '), pos + 1)) AS term",
        )
        .filter("term IS NOT NULL AND term <> ''")
    )
    counted = anchors.groupBy("dst", "term").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("term"))
    w_all = Window.partitionBy("dst")
    topk = (
        counted.withColumn("rk", F.row_number().over(w))
        .withColumn("in_links", F.sum("n").over(w_all))
        .filter(F.col("rk") <= ANCHOR_TOPK)
    )
    return (
        topk.join(idx, topk.dst == idx.vid)
        .select("doc_id", "term", "n", F.col("in_links").cast("long").alias("in_links"))
        .orderBy("doc_id", F.desc("n"), "term")
    )


# ------------------------------------------------------------ DuckDB twins
_CANON_DUCK = (
    f"('https://site' || (doc_id % {N_SITES}) || '.example.com/page/'"
    " || doc_id || '/')"
)

_URLS_DUCK = f"""
  urls_all AS (
    SELECT md5(text) AS ckey, {_CANON_DUCK} AS url FROM documents
    UNION ALL
    SELECT md5(text), {_CANON_DUCK} || 'index.html'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT md5(text), replace({_CANON_DUCK}, 'https://', 'http://')
    FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT md5(text), {_CANON_DUCK} || '?sid=abc123'
    FROM documents WHERE doc_id % 5 = 0
  ),
  urls AS (
    SELECT ckey, url FROM (
      SELECT *, count(*) OVER (PARTITION BY ckey) AS gsz FROM urls_all
    ) WHERE gsz <= {MAX_ALIASES}
  )
"""


def _hits_iter_duck(t: int) -> str:
    """One unrolled HITS iteration (auth then hub) as DuckDB CTEs.

    The ``*_raw`` CTEs are MATERIALIZED: each is referenced twice (the
    rescale reads it in FROM *and* in the scalar max subquery), and
    DuckDB's default inlining would recompute the whole upstream chain
    per reference — 2 references per level compounds to 2^(2·iters)
    base scans (measured: 28 s at sf0.01 inlined, <1 s materialized)."""
    return f"""
        a{t}_raw AS MATERIALIZED (
          SELECT i.vid, CAST(coalesce(s.r, 0) AS BIGINT) AS r
          FROM idx i LEFT JOIN (
            SELECT e.dst AS vid, sum(h.h) AS r
            FROM e JOIN h{t - 1} h ON e.src = h.vid GROUP BY e.dst
          ) s ON i.vid = s.vid),
        a{t} AS (
          SELECT vid, r * {HITS_SCALE} //
                 greatest((SELECT max(r) FROM a{t}_raw), 1) AS a
          FROM a{t}_raw),
        h{t}_raw AS MATERIALIZED (
          SELECT i.vid, CAST(coalesce(s.r, 0) AS BIGINT) AS r
          FROM idx i LEFT JOIN (
            SELECT e.src AS vid, sum(a.a) AS r
            FROM e JOIN a{t} a ON e.dst = a.vid GROUP BY e.src
          ) s ON i.vid = s.vid),
        h{t} AS (
          SELECT vid, r * {HITS_SCALE} //
                 greatest((SELECT max(r) FROM h{t}_raw), 1) AS h
          FROM h{t}_raw)"""


ORACLE_SQL = {
    "dust_rules": f"""
        WITH {_URLS_DUCK},
        pairs AS (
          SELECT x.url AS ua, y.url AS ub
          FROM urls x JOIN urls y
            ON x.ckey = y.ckey AND x.url < y.url
        ),
        mid1 AS (
          SELECT ua, ub, length(ua) AS la, length(ub) AS lb,
                 least(length(ua), length(ub)) AS m
          FROM pairs
        ),
        mid2 AS (
          SELECT ua, ub, la, lb,
                 list_sum(list_transform(range(1, m + 1), i ->
                   CASE WHEN substr(ua, 1, i) = substr(ub, 1, i)
                        THEN 1 ELSE 0 END)) AS lcp,
                 list_sum(list_transform(range(1, m + 1), i ->
                   CASE WHEN substr(ua, la - i + 1, i)
                           = substr(ub, lb - i + 1, i)
                        THEN 1 ELSE 0 END)) AS lcs_raw,
                 m
          FROM mid1
        ),
        mid3 AS (
          SELECT ua, ub, la, lb, lcp,
                 least(lcs_raw, m - lcp) AS lcs
          FROM mid2
        )
        SELECT regexp_extract(ua, '{HOST_RE}', 1) AS host,
               substr(ua, CAST(lcp + 1 AS INT), CAST(la - lcp - lcs AS INT))
                 AS alpha,
               substr(ub, CAST(lcp + 1 AS INT), CAST(lb - lcp - lcs AS INT))
                 AS beta,
               CAST(count(*) AS BIGINT) AS support
        FROM mid3
        WHERE regexp_extract(ua, '{HOST_RE}', 1)
                = regexp_extract(ub, '{HOST_RE}', 1)
        GROUP BY host, alpha, beta
        HAVING count(*) >= {MIN_SUPPORT}
        ORDER BY support DESC, host, alpha, beta
    """,
    "hits_topk": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        e AS (
          SELECT vid AS src,
                 ((vid // 2) + 17 * j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, HITS_FANOUT + 1))}) AS t(j)),
        h0 AS (SELECT vid, CAST({HITS_SCALE} AS BIGINT) AS h FROM idx),
        {",".join(_hits_iter_duck(t) for t in range(1, HITS_ITERS + 1))}
        SELECT idx.doc_id,
               CAST(a{HITS_ITERS}.a AS BIGINT) AS auth_units,
               CAST(h{HITS_ITERS}.h AS BIGINT) AS hub_units
        FROM idx
        JOIN a{HITS_ITERS} ON idx.vid = a{HITS_ITERS}.vid
        JOIN h{HITS_ITERS} ON idx.vid = h{HITS_ITERS}.vid
        ORDER BY auth_units DESC, doc_id LIMIT 20
    """,
    "anchor_text_topk": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id, text,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        links AS (
          SELECT vid AS src, j - 1 AS pos,
                 (vid * 31 + j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, ANCHOR_FANOUT + 1))}) AS t(j)),
        anchors AS (
          SELECT l.dst,
                 lower(string_split(i.text, ' ')[l.pos + 1]) AS term
          FROM links l JOIN idx i ON l.src = i.vid
          WHERE string_split(i.text, ' ')[l.pos + 1] IS NOT NULL
            AND string_split(i.text, ' ')[l.pos + 1] <> ''),
        counted AS (
          SELECT dst, term, CAST(count(*) AS BIGINT) AS n
          FROM anchors GROUP BY dst, term),
        ranked AS (
          SELECT dst, term, n,
                 row_number() OVER (PARTITION BY dst ORDER BY n DESC, term)
                   AS rk,
                 CAST(sum(n) OVER (PARTITION BY dst) AS BIGINT) AS in_links
          FROM counted)
        SELECT idx.doc_id, ranked.term, ranked.n, ranked.in_links
        FROM ranked JOIN idx ON ranked.dst = idx.vid
        WHERE rk <= {ANCHOR_TOPK}
        ORDER BY idx.doc_id, ranked.n DESC, ranked.term
    """,
    "recrawl_schedule": f"""
        WITH agg AS (
          SELECT user_id AS url_id,
                 CAST(count(*) AS BIGINT) AS n_obs,
                 CAST(sum(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_changes,
                 CAST(max(floor(epoch(ts))) AS BIGINT) AS last_seen_epoch
          FROM events GROUP BY user_id
        )
        SELECT url_id, n_obs, n_changes,
               n_changes * {RC_SCALE} // n_obs AS change_rate_units,
               least({RC_MAX_H}, greatest(1,
                 {RC_BASE_H} * (n_obs + 1) // (n_changes + 1)))
                 AS next_interval_h,
               last_seen_epoch
                 + least({RC_MAX_H}, greatest(1,
                     {RC_BASE_H} * (n_obs + 1) // (n_changes + 1))) * 3600
                 AS next_fetch_epoch
        FROM agg ORDER BY url_id
    """,
}

def _budget_oracle() -> str:
    """Twin: re-derive domain_rank via graph.py's shared CTE pieces,
    then apportion — one SQL template, no drift."""
    from llm_scraper_spark.operators.graph import (
        _HOST_GRAPH_DUCK,
        _wpr_iter_sql,
        DG_ITERS,
        PR_SCALE,
    )

    return f"""
        WITH {_HOST_GRAPH_DUCK},
        vs AS (SELECT DISTINCT v FROM
                 (SELECT src AS v FROM he UNION ALL SELECT dst FROM he)),
        nnv AS (SELECT count(*) AS nv FROM vs),
        wout AS (SELECT src, sum(w) AS wo FROM he GROUP BY src),
        r0 AS (SELECT v, CAST({PR_SCALE} // (SELECT nv FROM nnv) AS BIGINT) AS r
               FROM vs),
        {",".join(_wpr_iter_sql(i) for i in range(1, DG_ITERS + 1))},
        ranked AS (
          SELECT v AS host, CAST(r AS BIGINT) AS rank_units
          FROM r{DG_ITERS}),
        tot AS (SELECT CAST(sum(rank_units) AS BIGINT) AS total_rank
                FROM ranked),
        based AS (
          SELECT host, rank_units,
                 {BUDGET_G} * rank_units // total_rank AS base,
                 ({BUDGET_G} * rank_units) % total_rank AS rem
          FROM ranked CROSS JOIN tot WHERE total_rank > 0),
        lo AS (SELECT {BUDGET_G} - sum(base) AS leftover FROM based),
        pos AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS pos
          FROM based)
        SELECT host, rank_units,
               CAST(base + CASE WHEN pos <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS budget
        FROM pos CROSS JOIN lo ORDER BY host
    """


ORACLE_SQL["crawl_budget_allocation"] = _budget_oracle()

ORACLE_SQL["rate_limit_admission"] = f"""
        WITH RECURSIVE reqs AS (
          SELECT user_id % {N_SITES} AS host,
                 CAST(floor(epoch(ts) / {TB_SLOT_S}) AS BIGINT) AS slot,
                 CAST(count(*) AS BIGINT) AS arrivals
          FROM events GROUP BY 1, 2),
        ordered AS (
          SELECT *, row_number() OVER (PARTITION BY host ORDER BY slot)
                   AS rn
          FROM reqs),
        fold AS (
          SELECT host, slot, arrivals, rn,
                 CAST(least(arrivals, {TB_CAP}) AS BIGINT) AS admitted,
                 CAST({TB_CAP} - least(arrivals, {TB_CAP}) AS BIGINT)
                   AS tokens_after
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.host, o.slot, o.arrivals, o.rn,
                 CAST(least(o.arrivals,
                   least({TB_CAP}, f.tokens_after
                         + (o.slot - f.slot) * {TB_REFILL})) AS BIGINT),
                 CAST(least({TB_CAP}, f.tokens_after
                        + (o.slot - f.slot) * {TB_REFILL})
                      - least(o.arrivals,
                          least({TB_CAP}, f.tokens_after
                                + (o.slot - f.slot) * {TB_REFILL}))
                      AS BIGINT)
          FROM ordered o JOIN fold f
            ON o.host = f.host AND o.rn = f.rn + 1)
        SELECT host, slot, arrivals, admitted,
               arrivals - admitted AS dropped, tokens_after
        FROM fold ORDER BY host, slot
"""

ORACLE_SQL["dust_apply"] = f"""
        WITH rules AS (
          SELECT * FROM ({ORACLE_SQL["dust_rules"]})
          WHERE length(beta) >= {DUST_MIN_BETA}),
        {_URLS_DUCK},
        u AS (SELECT DISTINCT url,
                     regexp_extract(url, '{HOST_RE}', 1) AS host
              FROM urls),
        cand AS (
          SELECT u.url, r.alpha, r.beta, r.support
          FROM u LEFT JOIN rules r
            ON u.host = r.host AND contains(u.url, r.beta)),
        best AS (
          SELECT *, row_number() OVER (
            PARTITION BY url
            ORDER BY coalesce(support, -1) DESC, alpha, beta) AS rk
          FROM cand)
        SELECT url,
               CASE WHEN beta IS NOT NULL THEN replace(url, beta, alpha)
                    ELSE url END AS canon_url,
               beta IS NOT NULL AS rewritten
        FROM best WHERE rk = 1 ORDER BY url
"""

QUERIES = {
    "dust_rules": dust_rules,
    "hits_topk": hits_topk,
    "recrawl_schedule": recrawl_schedule,
    "anchor_text_topk": anchor_text_topk,
    "crawl_budget_allocation": crawl_budget_allocation,
    "dust_apply": dust_apply,
    "rate_limit_admission": rate_limit_admission,
}
