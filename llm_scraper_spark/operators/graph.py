"""Property-graph build (the reference's ArangoDB ``createKG`` sink,
src/database/db.py:207-469, re-expressed as DataFrame transforms):

  triplets → global dedup (db.py:448 ``set(triplets)``)
           → endpoint-type validation (db.py:453-455, P7)
           → vertices: union of subj/obj projections, node-key
             canonicalization (db.py:46-50,66: strip whitespace,
             forbidden chars → '_'), insert-if-absent dedup
             (db.py:76-79) = dropDuplicates on key
           → edges: endpoint resolution joins (db.py:91-95, J2) —
             shuffle-hash semi-joins on the key (the vertex set grows
             with the corpus, so it is never broadcast; see the note
             at the join site below)
  degree top-k (A1/O2): the AQL degree query
  (search_validation_playwright.py:214-226) as groupBy+count+limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EDGE_TYPES, NODE_TYPES

# key = regexp_replace(strip-all-whitespace, forbidden, '_') — JVM-side
def _key(col):
    return F.regexp_replace(F.regexp_replace(col, r"\s+", ""), "[^a-zA-Z0-9_-]", "_")


def build_kg(triplets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """triplets(url, subj_type, subj, predicate, obj_type, obj[, weight])
    → (vertices(key,type,name), edges(src_key,dst_key,relationship,weight))."""
    t = triplets.dropDuplicates(
        ["subj_type", "subj", "predicate", "obj_type", "obj"]
    ).filter(
        F.col("subj_type").isin(NODE_TYPES)
        & F.col("obj_type").isin(NODE_TYPES)
        & F.col("predicate").isin(EDGE_TYPES)
    )
    if "weight" not in t.columns:
        t = t.withColumn("weight", F.lit(1.0))
    subj_v = t.select(
        _key(F.col("subj")).alias("key"),
        F.col("subj_type").alias("type"),
        F.col("subj").alias("name"),
    )
    obj_v = t.select(
        _key(F.col("obj")).alias("key"),
        F.col("obj_type").alias("type"),
        F.col("obj").alias("name"),
    )
    vertices = subj_v.unionByName(obj_v).dropDuplicates(["key"])
    edges = t.select(
        _key(F.col("subj")).alias("src_key"),
        _key(F.col("obj")).alias("dst_key"),
        F.col("predicate").alias("relationship"),
        "weight",
    ).dropDuplicates(["src_key", "dst_key", "relationship"])
    # endpoint-existence validation joins (J2) — semantically the
    # insert-time lookups (reference db.py:91-95).  shuffle_hash, NOT
    # broadcast: the vertex set grows with the corpus (billions of keys
    # at 10^10 docs), so an explicit broadcast hint — which Catalyst
    # obeys unconditionally — is a driver/executor OOM at scale; a
    # shuffle-hash semi-join on the key is linear and co-partitioned
    # with the second lookup.
    v_keys = vertices.select("key")
    edges = edges.join(
        v_keys.withColumnRenamed("key", "src_key").hint("shuffle_hash"),
        "src_key",
        "left_semi",
    ).join(
        v_keys.withColumnRenamed("key", "dst_key").hint("shuffle_hash"),
        "dst_key",
        "left_semi",
    )
    return vertices, edges


def degree_topk(edges: DataFrame, k: int = 10) -> DataFrame:
    """Inbound-degree top-k (AQL analog) — partial+final hash agg then
    TakeOrderedAndProject; deterministic tie-break on key."""
    return (
        edges.groupBy(F.col("dst_key").alias("key"))
        .agg(F.count("*").cast("long").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("key"))
        .limit(k)
    )


# ------------------------------------------------------------- PageRank
#: fixed-point PageRank parameters: rank unit scale, damping as an
#: integer percentage, fan-out per page, iteration count.  Integer
#: arithmetic end-to-end makes every iteration's value independent of
#: floating-point summation order, so a distributed Spark aggregation
#: and a single-threaded DuckDB twin agree bit-for-bit (the same trick
#: as the integer-sum k-means centroids in similarity.py).
PR_SCALE = 10**12
PR_DAMP_PCT = 85
PR_FANOUT = 3
PR_ITERS = 5


def link_pagerank(docs, iters: int = PR_ITERS):
    """PageRank over a deterministic synthetic link graph (every doc
    links to the PR_FANOUT docs at dense-index (31*i + j) mod n) —
    the crawl-priority signal the north rule's frontier priority queue
    consumes (a production crawl feeds real hyperlink edges in; the
    arithmetic graph keeps testdata self-contained and cross-engine
    reproducible).

    Scale shape: per iteration one equi-join of ranks onto edges (both
    sides hash-partitioned on the key) and one sum aggregate —
    O(edges) shuffle per round, rank state never on the driver.
    Uniform out-degree means no dangling-mass correction term.

    Fixed-point integers: rank is in units of 1/PR_SCALE.  Each hop
    contributes rank DIV fanout; the damped update is
    (100-d)%·SCALE/n + d%·sum, all in integer DIV — order-independent
    and exact in both engines (all values non-negative, so floor ≡
    truncation)."""
    from pyspark.sql import Window

    # Dense-id assignment via a GLOBAL row_number: a single-partition
    # sort that exists only to *construct* the synthetic graph from a
    # bare doc list.  The PageRank kernel below consumes any (src, dst)
    # edge table — a production run feeds real hyperlink edges and
    # never executes this window.
    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")  # row_number is int32; vid*31 overflows past ~7e7 docs
        .alias("vid"),
    )
    n = idx.count()  # scalar graph size (bounded: one long, not data)
    if n == 0:
        # an empty doc table has an empty rank vector, not a
        # ZeroDivisionError from PR_SCALE // n below
        return docs.select(
            "doc_id", F.lit(0).cast("long").alias("rank_units")
        ).limit(0)
    edges = idx.select(
        F.col("vid").alias("src"),
        F.explode(
            F.array(
                *[
                    (F.col("vid") * 31 + F.lit(j)) % n
                    for j in range(1, PR_FANOUT + 1)
                ]
            )
        ).alias("dst"),
    )
    base = (100 - PR_DAMP_PCT) * PR_SCALE // (100 * n)
    ranks = idx.select("vid", F.lit(PR_SCALE // n).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.vid)
            .select("dst", F.expr(f"r div {PR_FANOUT}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = idx.select("vid").join(
            contrib, idx.vid == contrib.dst, "left"
        ).select(
            "vid",
            (
                F.lit(base)
                + F.expr(
                    f"{PR_DAMP_PCT} * coalesce(s, 0L) div 100"
                )
            ).cast("long").alias("r"),
        )
    return idx.join(ranks, "vid").select("doc_id", F.col("r").alias("rank_units"))


def link_pagerank_topk(spark, sf_dir: str) -> DataFrame:
    """Driver gate: top-20 docs by fixed-point PageRank (the frontier
    priority signal), deterministic tie-break on doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return (
        link_pagerank(docs)
        .orderBy(F.desc("rank_units"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------- triangle counting
def kg_triangle_count(spark, sf_dir: str) -> DataFrame:
    """Global wedge/triangle census over the synthetic link graph (the
    same deterministic (vid*31+j) mod n edge set PageRank uses) — the
    community-density signal a crawl scheduler can use to spot link
    farms (reference analog: the KG the reference builds in
    db.py:207-469 is exactly such a graph; it never analyses it).

    Degree-ordered algorithm (the MapReduce-classic of Suri &
    Vassilvitskii, WWW'11): orient every undirected edge from the
    lower-(degree, id) endpoint to the higher one, enumerate wedges by
    self-joining the oriented edges on the middle vertex, and close
    each wedge against the undirected edge set.  The orientation
    bounds every vertex's out-degree by O(sqrt(E)), so the wedge join
    is O(E^1.5) worst-case instead of sum-of-degree-squares —
    hot-vertex (hub) skew is capped by construction, which is the
    property that matters at a 10^10-edge web graph.  All joins are
    int-key equi-joins; the only window-free global is the final
    1-row aggregate."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("vid"),
    )
    n = idx.count()  # scalar graph size (construction-only, as PageRank)
    if n == 0:
        return spark.createDataFrame(
            [(0, 0)], "n_wedges long, n_triangles long"
        )
    raw = idx.select(
        F.col("vid").alias("src"),
        F.explode(
            F.array(
                *[
                    (F.col("vid") * 31 + F.lit(j)) % n
                    for j in range(1, PR_FANOUT + 1)
                ]
            )
        ).alias("dst"),
    )
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    # orient a→b iff (deg_a, a) < (deg_b, b): a total order, so the
    # oriented graph is a DAG and each triangle has exactly one vertex
    # with two out-edges (counted once, no /3 correction)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("b"),
            )
            .otherwise(F.col("a"))
            .alias("w"),
        )
    )
    e1 = oriented.select(F.col("u").alias("x"), F.col("w").alias("y"))
    e2 = oriented.select(F.col("u").alias("y"), F.col("w").alias("z"))
    wedges = e1.join(e2, "y").select(
        F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
    )
    closed = wedges.join(
        und.withColumn("hit", F.lit(1).cast("long")), ["a", "b"], "left"
    )
    return closed.agg(
        F.count("*").cast("long").alias("n_wedges"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_triangles"),
    )


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration for the DuckDB twin (the same
    unrolled-CTE pattern as similarity._kmeans_iter_sql)."""
    return f"""
    c{i} AS (
      SELECT e.dst AS vid, sum(p{i - 1}.r // {PR_FANOUT}) AS s
      FROM e JOIN p{i - 1} ON e.src = p{i - 1}.vid GROUP BY e.dst),
    p{i} AS (
      SELECT idx.vid,
             CAST(({100 - PR_DAMP_PCT} * {PR_SCALE} // (100 * (SELECT n FROM nn)))
                  + ({PR_DAMP_PCT} * coalesce(c{i}.s, 0) // 100) AS BIGINT) AS r
      FROM idx LEFT JOIN c{i} ON idx.vid = c{i}.vid)"""


# ------------------------------------------------ host/domain webgraph
#: hosts in the synthetic universe: host(page) = vid % N_HOSTS_DG —
#: the same 20-bucket host family webarchive/crawlsched use
N_HOSTS_DG = 20
DG_ITERS = 5


def host_graph(docs) -> DataFrame:
    """Host-level webgraph: the page-level link graph (same
    deterministic (vid·31+j) mod n edge map as `link_pagerank`)
    aggregated to ``(src_host, dst_host, n_links)`` — the two-level
    rollup the public webgraph datasets publish (page graph → host /
    domain graph) and the granularity a crawl scheduler budgets at.
    One O(page-edges) groupBy; output is |hosts|² at most, tiny
    relative to the page graph at any scale."""
    from pyspark.sql import Window

    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("vid"),
    )
    n = idx.count()  # scalar graph size (construction-only, as PageRank)
    if n == 0:
        return docs.sparkSession.createDataFrame(
            [], "src_host long, dst_host long, n_links long"
        )
    return (
        idx.select(
            F.col("vid").alias("src"),
            F.explode(
                F.array(
                    *[
                        (F.col("vid") * 31 + F.lit(j)) % n
                        for j in range(1, PR_FANOUT + 1)
                    ]
                )
            ).alias("dst"),
        )
        .groupBy(
            (F.col("src") % N_HOSTS_DG).alias("src_host"),
            (F.col("dst") % N_HOSTS_DG).alias("dst_host"),
        )
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def _wpr_fixed_point(
    edges: DataFrame, verts: DataFrame, init_expr: str, base_expr: str,
    iters: int,
) -> DataFrame:
    """The shared weighted-PageRank fixed-point kernel: per iteration,
    every vertex passes ``rank·w div w_out`` along its out-edges
    (per-edge integer div → order-independent, bit-exact cross-engine),
    then ``rank = base + damp·inflow div 100``.  The teleport policy is
    the caller's: `init_expr` / `base_expr` are SQL over the `verts`
    frame's columns — uniform for PageRank, seed-concentrated for
    TrustRank.  Vertices with no out-edges drop their mass (the
    synthetic host graph has none — a production caller redistributes
    dangling mass if its graph does).

    Scale shape: ``w_out`` is joined onto the edge list ONCE
    (persisted — every iteration re-reads it), then each iteration is
    one O(edges) equi-join + sum.  Lineage stays linear in iters."""
    from pyspark.storagelevel import StorageLevel

    wout = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = edges.join(wout, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = verts.selectExpr("v", f"cast(({init_expr}) as long) AS r")
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.v)
            .select("dst", F.expr("r * w div wout").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = verts.join(contrib, verts.v == contrib.dst, "left").selectExpr(
            "v",
            f"cast(({base_expr}) + {PR_DAMP_PCT} * coalesce(s, 0L) div 100"
            " as long) AS r",
        )
    return ranks


def weighted_pagerank(edges: DataFrame, iters: int = DG_ITERS) -> DataFrame:
    """Fixed-point integer PageRank over a WEIGHTED graph ``(src, dst,
    w)`` with the uniform teleport vector — see `_wpr_fixed_point` for
    the shared kernel and its scale shape."""
    from pyspark.storagelevel import StorageLevel

    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nv = verts.count()  # scalar vertex count (bounded: hosts, not pages)
    if nv == 0:
        return edges.sparkSession.createDataFrame([], "v long, rank_units long")
    base = (100 - PR_DAMP_PCT) * PR_SCALE // (100 * nv)
    ranks = _wpr_fixed_point(
        edges, verts, f"{PR_SCALE // nv}L", f"{base}L", iters
    )
    return ranks.select("v", F.col("r").alias("rank_units"))


def host_graph_edges(spark, sf_dir: str) -> DataFrame:
    """Driver gate: the host-level webgraph, deterministic order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return host_graph(docs).orderBy("src_host", "dst_host")


def domain_rank(spark, sf_dir: str) -> DataFrame:
    """Driver gate: weighted PageRank over the host graph — the
    domain-level crawl-priority signal (public webgraph datasets rank
    hosts/domains exactly this way)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    he = host_graph(docs).select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("n_links").alias("w"),
    )
    return (
        weighted_pagerank(he)
        .select(F.col("v").alias("host"), "rank_units")
        .orderBy(F.desc("rank_units"), "host")
    )


#: TrustRank trusted seed set: the first TR_SEEDS host ids (a real
#: deployment curates this list by hand — it is tiny by definition,
#: which is what makes the trust-vector join broadcastable at any
#: corpus size).
TR_SEEDS = 3


def trust_weighted_pagerank(
    edges: DataFrame, seeds: DataFrame, iters: int = DG_ITERS
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen — VLDB '04):
    PageRank with the teleport vector concentrated on a hand-curated
    trusted seed set instead of uniform — trust flows out from the
    seeds along links, so spam hosts that merely link-farm INTO good
    hosts acquire no score.  The crawl scheduler uses it as the
    spam-resistant twin of `domain_rank` (prioritize frontier URLs by
    the trust of the linking host).

    Built on `_wpr_fixed_point` (the shared weighted-PageRank kernel)
    with the teleport concentrated: the per-iteration base term is
    ``(1−d)·SCALE div n_seeds`` ON SEEDS ONLY (zero elsewhere), and
    the start vector is the trust vector itself.  ``seeds`` is a (v)
    frame, broadcast — trusted seed lists are small by construction.
    ``n_seeds`` counts only seeds PRESENT in the graph (a seed with no
    edges can neither hold nor pass trust — counting it would silently
    evaporate its teleport share every iteration)."""
    from pyspark.storagelevel import StorageLevel

    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .join(
            F.broadcast(seeds.selectExpr("v", "true AS is_seed")),
            "v",
            "left",
        )
        .select("v", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # scalar: curated list ∩ graph vertices, bounded by definition
    n_seeds = verts.filter("is_seed").count()
    if n_seeds == 0:
        return edges.sparkSession.createDataFrame(
            [], "v long, trust_units long"
        )
    base = (100 - PR_DAMP_PCT) * PR_SCALE // (100 * n_seeds)
    ranks = _wpr_fixed_point(
        edges,
        verts,
        f"if(is_seed, {PR_SCALE // n_seeds}L, 0L)",
        f"if(is_seed, {base}L, 0L)",
        iters,
    )
    return ranks.select("v", F.col("r").alias("trust_units"))


def trustrank_topk(spark, sf_dir: str) -> DataFrame:
    """Driver gate: TrustRank over the host graph, seeds = the first
    TR_SEEDS hosts, ordered (trust desc, host)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    he = host_graph(docs).select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("n_links").alias("w"),
    )
    seeds = spark.range(TR_SEEDS).selectExpr("id AS v")
    return (
        trust_weighted_pagerank(he, seeds)
        .select(F.col("v").alias("host"), "trust_units")
        .orderBy(F.desc("trust_units"), "host")
    )


def degree_distribution(spark, sf_dir: str) -> DataFrame:
    """Log₂-bucketed in/out-degree histogram of the page link graph —
    the first chart every webgraph paper prints and the first sanity
    check on a crawl (a power law with the wrong slope means the
    frontier is trapped).  Bucket = length(bin(degree)) − 1 =
    ⌊log₂ degree⌋, the repo's integer-log idiom — no libm.  Two
    O(edges) degree aggs + one O(vertices) bucket agg; output is
    O(log max-degree) rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    edges = host_graph(docs)  # (src_host, dst_host, n_links)
    pe = edges.selectExpr(
        "src_host AS src", "dst_host AS dst", "n_links AS w"
    )
    outd = pe.groupBy("src").agg(F.sum("w").cast("long").alias("deg"))
    ind = pe.groupBy("dst").agg(F.sum("w").cast("long").alias("deg"))

    def hist(d: DataFrame, which: str) -> DataFrame:
        return (
            d.selectExpr(
                f"'{which}' AS side",
                "cast(length(bin(deg)) - 1 as bigint) AS log2_bucket",
            )
            .groupBy("side", "log2_bucket")
            .agg(F.count("*").cast("long").alias("n_vertices"))
        )

    return (
        hist(outd, "out")
        .unionByName(hist(ind, "in"))
        .orderBy("side", "log2_bucket")
    )


# ----------------------------------------------------------------- k-core
KC_K = 2          # the core order under test
KC_ROUNDS = 6     # peel rounds unrolled (a 10-path dies in 5)
KC_BLOCK = 10     # synthetic block width


def kcore_peel(edges: DataFrame, k: int = KC_K,
               rounds: int = KC_ROUNDS) -> DataFrame:
    """The k-core of an undirected graph ``(a, b)`` by iterative
    peeling (Seidman '83; the web-spam/community primitive next to
    degree and PageRank): repeatedly drop vertices whose degree within
    the surviving set is < k.  Each round is one O(edges) semi-join +
    degree agg — the standard distributed form; lineage is cut per
    round.  RAISES if the fixpoint isn't reached within `rounds`
    (same contract as dedup_clusters / resolve_redirects: never return
    a half-peeled core).  Returns the surviving vertex set ``(v)``."""
    sym = edges.selectExpr("a AS u", "b AS w").unionByName(
        edges.selectExpr("b AS u", "a AS w")
    )
    alive = sym.select(F.col("u").alias("v")).distinct()
    for _ in range(rounds):
        deg = (
            sym.join(alive.selectExpr("v AS u"), "u")
            .join(alive.selectExpr("v AS w"), "w")
            .groupBy("u")
            .agg(F.count("*").cast("long").alias("deg"))
        )
        alive = (
            deg.filter(F.col("deg") >= k)
            .selectExpr("u AS v")
            .localCheckpoint(eager=True)
        )
    # fixpoint check: one more peel must change nothing.  The degree
    # agg is inner-join-shaped, so an alive vertex whose surviving
    # neighbors all died has NO deg row at all — left-join alive onto
    # deg and treat the missing row as degree 0, else non-convergence
    # slips through silently (e.g. the middle of a long path when
    # `rounds` runs out before the peel reaches it).
    deg = (
        sym.join(alive.selectExpr("v AS u"), "u")
        .join(alive.selectExpr("v AS w"), "w")
        .groupBy("u")
        .agg(F.count("*").alias("deg"))
    )
    check = alive.join(deg.selectExpr("u AS v", "deg"), "v", "left")
    if check.filter(F.expr(f"coalesce(deg, 0L) < {k}")).limit(1).count():
        raise RuntimeError(
            f"k-core peeling did not converge in {rounds} rounds — "
            "raise KC_ROUNDS for this graph"
        )
    return alive


def kcore_membership(spark, sf_dir: str) -> DataFrame:
    """Driver gate: the 2-core of the planted block graph — vertices
    0..n−1 in blocks of KC_BLOCK, chained within each block; EVEN
    blocks close their cycle (a 2-core that survives), odd blocks stay
    paths (peel away end-in)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()  # scalar graph size, as link_pagerank
    if n == 0:
        return spark.createDataFrame([], "v long")
    idx = docs.sparkSession.range(n).selectExpr("id AS i")
    chain = idx.filter(
        (F.col("i") % KC_BLOCK < KC_BLOCK - 1) & (F.col("i") + 1 < n)
    ).selectExpr("i AS a", "i + 1 AS b")
    closing = idx.filter(
        (F.col("i") % KC_BLOCK == 0)
        & ((F.col("i") / KC_BLOCK).cast("long") % 2 == 0)
        & (F.col("i") + KC_BLOCK - 1 < n)
    ).selectExpr(f"i + {KC_BLOCK - 1} AS a", "i AS b")
    return kcore_peel(chain.unionByName(closing)).orderBy("v")


def _kcore_round_sql(r: int, k: int) -> str:
    return f"""
    d{r} AS (
      SELECT u, count(*) AS deg
      FROM sym
      WHERE u IN (SELECT v FROM a{r - 1})
        AND w IN (SELECT v FROM a{r - 1})
      GROUP BY u),
    a{r} AS (SELECT u AS v FROM d{r} WHERE deg >= {k})"""


def seed_expansion_cocite(spark, sf_dir: str) -> DataFrame:
    """Focused-crawl seed expansion by outlink co-citation: rank every
    non-seed host against every trusted seed by the Jaccard similarity
    of their OUTLINK sets (hosts that link to the same places as a
    curated seed are the next hosts worth crawling — the classic
    companion signal to TrustRank's forward propagation; cf.
    Kleinberg's co-citation basis for HITS).  Fixed-point
    ``jaccard_units = |∩|·SCALE div |∪|`` — integer-exact cross-engine.

    Scale shape: the intersection comes from one self-join of the
    host-graph edge list on the SHARED DESTINATION (O(Σ per-dst
    host-pair fanout) — bounded here because both sides are HOST-level
    rollups; a page-level co-citation would cap per-dst in-degree
    first, same discipline as dedup.MAX_BUCKET), one groupBy to count,
    and a broadcast of the seed-host outdegree table (seed lists are
    tiny by definition)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    edges = host_graph(docs).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    outdeg = edges.groupBy("src").agg(
        F.countDistinct("dst").cast("long").alias("outdeg")
    )
    seeds = edges.filter(F.col("src") < TR_SEEDS)
    inter = (
        edges.filter(F.col("src") >= TR_SEEDS)
        .join(
            F.broadcast(seeds.select(F.col("src").alias("seed"), "dst")),
            "dst",
        )
        .groupBy("src", "seed")
        .agg(F.count("*").cast("long").alias("inter_links"))
    )
    return (
        inter.join(outdeg, "src")
        .join(
            F.broadcast(
                outdeg.selectExpr("src AS seed", "outdeg AS seed_outdeg")
            ),
            "seed",
        )
        .selectExpr(
            "src AS host",
            "seed",
            "inter_links",
            "outdeg + seed_outdeg - inter_links AS union_links",
            f"inter_links * {PR_SCALE}L"
            " div (outdeg + seed_outdeg - inter_links) AS jaccard_units",
        )
        .orderBy(F.desc("jaccard_units"), "host", "seed")
    )


def _tr_iter_sql(i: int) -> str:
    # normalize by the SAME present-in-graph seed count the Spark side
    # uses (trust_weighted_pagerank counts seeds ∩ vertices) — a seed
    # host absent from the graph must not evaporate teleport share in
    # one engine but not the other.  `trns` is the 1-row CTE below.
    base = (
        f"{100 - PR_DAMP_PCT} * {PR_SCALE}"
        f" // (100 * greatest((SELECT k FROM trns), 1))"
    )
    return f"""
    tc{i} AS (
      SELECT he.dst AS v, sum(t{i - 1}.r * he.w // wout.wo) AS s
      FROM he JOIN t{i - 1} ON he.src = t{i - 1}.v
              JOIN wout ON he.src = wout.src
      GROUP BY he.dst),
    t{i} AS (
      SELECT vs.v,
             CAST((CASE WHEN vs.v < {TR_SEEDS} THEN {base} ELSE 0 END)
                  + ({PR_DAMP_PCT} * coalesce(tc{i}.s, 0) // 100) AS BIGINT) AS r
      FROM vs LEFT JOIN tc{i} ON vs.v = tc{i}.v)"""


def _wpr_iter_sql(i: int) -> str:
    return f"""
    wc{i} AS (
      SELECT he.dst AS v, sum(r{i - 1}.r * he.w // wout.wo) AS s
      FROM he JOIN r{i - 1} ON he.src = r{i - 1}.v
              JOIN wout ON he.src = wout.src
      GROUP BY he.dst),
    r{i} AS (
      SELECT vs.v,
             CAST(({100 - PR_DAMP_PCT} * {PR_SCALE} // (100 * (SELECT nv FROM nnv)))
                  + ({PR_DAMP_PCT} * coalesce(wc{i}.s, 0) // 100) AS BIGINT) AS r
      FROM vs LEFT JOIN wc{i} ON vs.v = wc{i}.v)"""


_HOST_GRAPH_DUCK = f"""
        nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        pe AS (
          SELECT vid AS src, (vid * 31 + j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, PR_FANOUT + 1))}) AS t(j)),
        he AS (
          SELECT src % {N_HOSTS_DG} AS src, dst % {N_HOSTS_DG} AS dst,
                 CAST(count(*) AS BIGINT) AS w
          FROM pe GROUP BY 1, 2)"""


ORACLE_SQL = {
    "host_graph_edges": f"""
        WITH {_HOST_GRAPH_DUCK}
        SELECT src AS src_host, dst AS dst_host, w AS n_links
        FROM he ORDER BY src_host, dst_host
    """,
    "domain_rank": f"""
        WITH {_HOST_GRAPH_DUCK},
        vs AS (SELECT DISTINCT v FROM
                 (SELECT src AS v FROM he UNION ALL SELECT dst FROM he)),
        nnv AS (SELECT count(*) AS nv FROM vs),
        wout AS (SELECT src, sum(w) AS wo FROM he GROUP BY src),
        r0 AS (SELECT v, CAST({PR_SCALE} // (SELECT nv FROM nnv) AS BIGINT) AS r
               FROM vs),
        {",".join(_wpr_iter_sql(i) for i in range(1, DG_ITERS + 1))}
        SELECT v AS host, CAST(r AS BIGINT) AS rank_units
        FROM r{DG_ITERS}
        ORDER BY rank_units DESC, host
    """,
    "kcore_membership": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (SELECT unnest(range(0, (SELECT n FROM nn))) AS i),
        chain AS (
          SELECT i AS a, i + 1 AS b FROM idx
          WHERE i % {KC_BLOCK} < {KC_BLOCK - 1}
            AND i + 1 < (SELECT n FROM nn)),
        closing AS (
          SELECT i + {KC_BLOCK - 1} AS a, i AS b FROM idx
          WHERE i % {KC_BLOCK} = 0 AND (i // {KC_BLOCK}) % 2 = 0
            AND i + {KC_BLOCK - 1} < (SELECT n FROM nn)),
        e AS (SELECT * FROM chain UNION ALL SELECT * FROM closing),
        sym AS (
          SELECT a AS u, b AS w FROM e
          UNION ALL SELECT b, a FROM e),
        a0 AS (SELECT DISTINCT u AS v FROM sym),
        {",".join(_kcore_round_sql(r, KC_K) for r in range(1, KC_ROUNDS + 1))}
        SELECT CAST(v AS BIGINT) AS v FROM a{KC_ROUNDS} ORDER BY v
    """,
    "degree_distribution": f"""
        WITH {_HOST_GRAPH_DUCK},
        outd AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg
                 FROM he GROUP BY src),
        ind AS (SELECT dst, CAST(sum(w) AS BIGINT) AS deg
                FROM he GROUP BY dst),
        h AS (
          SELECT 'out' AS side,
                 CAST(length(bin(deg)) - 1 AS BIGINT) AS log2_bucket
          FROM outd
          UNION ALL
          SELECT 'in', CAST(length(bin(deg)) - 1 AS BIGINT) FROM ind)
        SELECT side, log2_bucket,
               CAST(count(*) AS BIGINT) AS n_vertices
        FROM h GROUP BY side, log2_bucket
        ORDER BY side, log2_bucket
    """,
    "seed_expansion_cocite": f"""
        WITH {_HOST_GRAPH_DUCK},
        e AS (SELECT DISTINCT src, dst FROM he),
        outdeg AS (
          SELECT src, CAST(count(DISTINCT dst) AS BIGINT) AS outdeg
          FROM e GROUP BY src),
        inter AS (
          SELECT c.src, s.src AS seed,
                 CAST(count(*) AS BIGINT) AS inter_links
          FROM e c JOIN e s ON c.dst = s.dst
          WHERE c.src >= {TR_SEEDS} AND s.src < {TR_SEEDS}
          GROUP BY c.src, s.src)
        SELECT i.src AS host, i.seed, i.inter_links,
               o.outdeg + so.outdeg - i.inter_links AS union_links,
               i.inter_links * {PR_SCALE}
                 // (o.outdeg + so.outdeg - i.inter_links) AS jaccard_units
        FROM inter i
        JOIN outdeg o ON i.src = o.src
        JOIN outdeg so ON i.seed = so.src
        ORDER BY jaccard_units DESC, host, seed
    """,
    "trustrank_topk": f"""
        WITH {_HOST_GRAPH_DUCK},
        vs AS (SELECT DISTINCT v FROM
                 (SELECT src AS v FROM he UNION ALL SELECT dst FROM he)),
        trns AS (SELECT count(*) AS k FROM vs WHERE v < {TR_SEEDS}),
        wout AS (SELECT src, sum(w) AS wo FROM he GROUP BY src),
        t0 AS (SELECT v,
                      CAST(CASE WHEN v < {TR_SEEDS}
                                THEN {PR_SCALE}
                                     // greatest((SELECT k FROM trns), 1)
                                ELSE 0 END AS BIGINT) AS r
               FROM vs),
        {",".join(_tr_iter_sql(i) for i in range(1, DG_ITERS + 1))}
        SELECT v AS host, CAST(r AS BIGINT) AS trust_units
        FROM t{DG_ITERS}
        WHERE (SELECT k FROM trns) > 0
        ORDER BY trust_units DESC, host
    """,
    "link_pagerank_topk": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        e AS (
          SELECT vid AS src,
                 (vid * 31 + j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, PR_FANOUT + 1))}) AS t(j)),
        p0 AS (
          SELECT vid, CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS r
          FROM idx),
        {",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
        SELECT idx.doc_id, CAST(p{PR_ITERS}.r AS BIGINT) AS rank_units
        FROM p{PR_ITERS} JOIN idx ON p{PR_ITERS}.vid = idx.vid
        ORDER BY rank_units DESC, doc_id LIMIT 20
    """,
    "kg_triangle_count": f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        idx AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vid
          FROM documents),
        raw AS (
          SELECT vid AS src, (vid * 31 + j) % (SELECT n FROM nn) AS dst
          FROM idx CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(1, PR_FANOUT + 1))}) AS t(j)),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
          GROUP BY v),
        ori AS (
          SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                      THEN u.a ELSE u.b END AS u,
                 CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                      THEN u.b ELSE u.a END AS w
          FROM und u JOIN deg da ON u.a = da.v JOIN deg db ON u.b = db.v),
        wedges AS (
          SELECT least(e1.u, e2.w) AS a, greatest(e1.u, e2.w) AS b
          FROM ori e1 JOIN ori e2 ON e1.w = e2.u)
        SELECT CAST(count(*) AS BIGINT) AS n_wedges,
               CAST(coalesce(sum(CASE WHEN und.a IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_triangles
        FROM wedges LEFT JOIN und ON wedges.a = und.a AND wedges.b = und.b
    """,
}

QUERIES = {
    "link_pagerank_topk": link_pagerank_topk,
    "kg_triangle_count": kg_triangle_count,
    "host_graph_edges": host_graph_edges,
    "domain_rank": domain_rank,
    "trustrank_topk": trustrank_topk,
    "seed_expansion_cocite": seed_expansion_cocite,
    "degree_distribution": degree_distribution,
    "kcore_membership": kcore_membership,
}
