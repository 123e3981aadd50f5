"""Fixed-point PageRank vs a pure-Python integer oracle + DuckDB twin."""

from llm_scraper_spark.operators import graph
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


def _python_pagerank(n: int, iters: int) -> list[int]:
    """Bit-exact reimplementation with plain ints (no Spark, no SQL)."""
    ranks = [graph.PR_SCALE // n] * n
    base = (100 - graph.PR_DAMP_PCT) * graph.PR_SCALE // (100 * n)
    for _ in range(iters):
        s = [0] * n
        for vid in range(n):
            c = ranks[vid] // graph.PR_FANOUT
            for j in range(1, graph.PR_FANOUT + 1):
                s[(vid * 31 + j) % n] += c
        ranks = [base + graph.PR_DAMP_PCT * sv // 100 for sv in s]
    return ranks


def test_pagerank_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["link_pagerank_topk"](spark, SF_DIR),
        graph.ORACLE_SQL["link_pagerank_topk"],
        SF_DIR,
        "link_pagerank_topk",
    )


def test_pagerank_matches_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    doc_ids = sorted(r["doc_id"] for r in docs.collect())
    n = len(doc_ids)
    expect = _python_pagerank(n, graph.PR_ITERS)
    got = {
        r["doc_id"]: r["rank_units"]
        for r in graph.link_pagerank(docs).collect()
    }
    assert len(got) == n
    for vid, doc_id in enumerate(doc_ids):
        assert got[doc_id] == expect[vid], (doc_id, vid)


def test_pagerank_mass_is_conserved_approximately(spark):
    """Total fixed-point mass stays within integer-truncation loss of
    PR_SCALE (each of n vertices truncates < 1 unit per div, 3 divs
    per iteration)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    total = sum(r["rank_units"] for r in graph.link_pagerank(docs).collect())
    n = docs.count()
    loss_bound = graph.PR_ITERS * 4 * n + n
    assert graph.PR_SCALE - loss_bound <= total <= graph.PR_SCALE


# ------------------------------------------------ host graph / domain rank
def test_host_graph_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["host_graph_edges"](spark, SF_DIR),
        graph.ORACLE_SQL["host_graph_edges"],
        SF_DIR,
        "host_graph_edges",
    )


def test_domain_rank_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["domain_rank"](spark, SF_DIR),
        graph.ORACLE_SQL["domain_rank"],
        SF_DIR,
        "domain_rank",
    )


def test_host_graph_accounts_every_page_edge(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n = docs.count()
    total = sum(
        r["n_links"] for r in graph.host_graph(docs).collect()
    )
    assert total == n * graph.PR_FANOUT


def _python_weighted_pagerank(
    edges: list[tuple[int, int, int]], iters: int
) -> dict[int, int]:
    """Independent plain-int weighted kernel: rank·w // w_out per edge."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    nv = len(verts)
    wout: dict[int, int] = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    base = (100 - graph.PR_DAMP_PCT) * graph.PR_SCALE // (100 * nv)
    r = {v: graph.PR_SCALE // nv for v in verts}
    for _ in range(iters):
        s_acc = {v: 0 for v in verts}
        for s, d, w in edges:
            s_acc[d] += r[s] * w // wout[s]
        r = {
            v: base + graph.PR_DAMP_PCT * s_acc[v] // 100 for v in verts
        }
    return r


def test_weighted_pagerank_matches_python_oracle_on_skewed_graph(spark):
    """A hand-built graph where one hub receives 10x the link weight:
    the kernel must match the plain-int oracle exactly AND rank the
    hub first."""
    edges = [
        (0, 9, 10), (1, 9, 10), (2, 9, 10), (3, 9, 10),
        (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1),
        (9, 0, 1), (9, 1, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["v"]: r["rank_units"]
        for r in graph.weighted_pagerank(df).collect()
    }
    expect = _python_weighted_pagerank(edges, graph.DG_ITERS)
    assert got == expect
    assert max(got, key=got.get) == 9


def _python_trustrank(edges, seeds, nverts, iters):
    """Plain-int TrustRank oracle: edges = [(src, dst, w)]."""
    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    n_seeds = len(seeds)
    base = (100 - graph.PR_DAMP_PCT) * graph.PR_SCALE // (100 * n_seeds)
    r = {
        v: (graph.PR_SCALE // n_seeds if v in seeds else 0)
        for v in range(nverts)
    }
    for _ in range(iters):
        s = {v: 0 for v in range(nverts)}
        for src, dst, w in edges:
            s[dst] += r[src] * w // wout[src]
        r = {
            v: (base if v in seeds else 0) + graph.PR_DAMP_PCT * s[v] // 100
            for v in range(nverts)
        }
    return r


def test_trustrank_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["trustrank_topk"](spark, SF_DIR),
        graph.ORACLE_SQL["trustrank_topk"],
        SF_DIR,
        "trustrank_topk",
    )


def test_trustrank_starves_spam_farm(spark):
    """Hand graph: trusted component {0,1,2} links among itself; a
    spam farm {3,4} links INTO the trusted hosts (classic link spam)
    but receives nothing from them — so it must end with zero trust,
    while plain weighted PageRank would happily rank it."""
    edges = [
        (0, 1, 5), (1, 2, 5), (2, 0, 5),       # trusted cycle
        (3, 0, 50), (4, 0, 50), (3, 4, 1), (4, 3, 1),  # spam farm
    ]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    got = {
        r.v: r.trust_units
        for r in graph.trust_weighted_pagerank(edf, seeds).collect()
    }
    expect = _python_trustrank(edges, {0, 1, 2}, 5, graph.DG_ITERS)
    assert got == expect
    assert all(got[v] > 0 for v in (0, 1, 2))
    spam_max = max(got[3], got[4])
    assert spam_max * 10 < min(got[v] for v in (0, 1, 2))


def test_trustrank_empty_seed_set_is_empty(spark):
    edf = spark.createDataFrame([(0, 1, 1)], "src long, dst long, w long")
    seeds = spark.createDataFrame([], "v long")
    assert graph.trust_weighted_pagerank(edf, seeds).count() == 0


def test_seed_expansion_jaccard_bounds_and_exclusions(spark):
    """Jaccard ∈ (0, SCALE]; seeds never appear as expansion hosts;
    a hand-check of one pair against python sets."""
    out = graph.QUERIES["seed_expansion_cocite"](spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.host >= graph.TR_SEEDS and 0 <= r.seed < graph.TR_SEEDS
        assert 0 < r.jaccard_units <= graph.PR_SCALE
        assert r.inter_links <= r.union_links
    # independent set-arithmetic check of the top row
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    edges = graph.host_graph(docs).collect()
    outs = {}
    for e in edges:
        outs.setdefault(e.src_host, set()).add(e.dst_host)
    top = out[0]
    inter = len(outs[top.host] & outs[top.seed])
    union = len(outs[top.host] | outs[top.seed])
    assert top.inter_links == inter and top.union_links == union
    assert top.jaccard_units == inter * graph.PR_SCALE // union


def test_seed_expansion_matches_duckdb(spark):
    assert_matches(
        graph.QUERIES["seed_expansion_cocite"](spark, SF_DIR),
        graph.ORACLE_SQL["seed_expansion_cocite"],
        SF_DIR,
        "seed_expansion_cocite",
    )


def test_degree_distribution_conserves_vertices(spark):
    """Each side's bucket counts sum to the number of hosts with that
    kind of edge; buckets are ⌊log₂ degree⌋ of a positive degree."""
    out = graph.QUERIES["degree_distribution"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    edges = graph.host_graph(docs).collect()
    n_src = len({e.src_host for e in edges})
    n_dst = len({e.dst_host for e in edges})
    sums = {"out": 0, "in": 0}
    for r in out:
        assert r.log2_bucket >= 0
        sums[r.side] += r.n_vertices
    assert sums == {"out": n_src, "in": n_dst}


def test_kcore_peels_tail_keeps_triangle(spark):
    """Triangle + pendant tail: the 2-core is exactly the triangle;
    the tail (including its attachment chain) peels end-in."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = sorted(r.v for r in graph.kcore_peel(df).collect())
    assert got == [0, 1, 2]


def test_kcore_gate_matches_planted_blocks(spark):
    """Survivors are exactly the vertices of even blocks (closed
    cycles); odd blocks (open paths) peel away."""
    out = sorted(
        r.v for r in graph.QUERIES["kcore_membership"](spark, SF_DIR).collect()
    )
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    expect = [
        v for v in range(n)
        if (v // graph.KC_BLOCK) % 2 == 0
        and (v // graph.KC_BLOCK) * graph.KC_BLOCK + graph.KC_BLOCK <= n
    ]
    assert out == expect


def test_kcore_nonconvergence_raises_on_isolated_survivor(spark):
    """ADVICE r3 regression: a 13-vertex path peels 2 endpoints per
    round, so rounds=6 strands the middle vertex with ZERO surviving
    neighbors — the inner-join degree agg emits no row for it, and the
    old fixpoint check silently returned a non-core.  The left-join
    check must raise; one more round converges to the (empty) 2-core."""
    import pytest

    edges = [(i, i + 1) for i in range(12)]
    spark_df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.kcore_peel(spark_df, rounds=6)
    assert graph.kcore_peel(spark_df, rounds=7).count() == 0


def test_trustrank_absent_seed_matches_recurrence(spark):
    """ADVICE r3 regression: seed host 0 is ABSENT from the graph, so
    the teleport normalizer must be 2 (present seeds), identically in
    both engines — the twin used to hardcode TR_SEEDS=3."""
    import duckdb

    edges = [(1, 3, 2), (2, 3, 1), (3, 4, 1), (4, 1, 1)]
    he = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(v,) for v in range(graph.TR_SEEDS)], "v long")
    got = {
        r.v: r.trust_units
        for r in graph.trust_weighted_pagerank(he, seeds).collect()
    }
    he_vals = ", ".join(f"({s},{d},{w})" for s, d, w in edges)
    sql = f"""WITH he AS (SELECT * FROM (VALUES {he_vals}) AS t(src, dst, w)),
      vs AS (SELECT DISTINCT v FROM
               (SELECT src AS v FROM he UNION ALL SELECT dst FROM he)),
      trns AS (SELECT count(*) AS k FROM vs WHERE v < {graph.TR_SEEDS}),
      wout AS (SELECT src, sum(w) AS wo FROM he GROUP BY src),
      t0 AS (SELECT v,
                    CAST(CASE WHEN v < {graph.TR_SEEDS}
                              THEN {graph.PR_SCALE}
                                   // greatest((SELECT k FROM trns), 1)
                              ELSE 0 END AS BIGINT) AS r
             FROM vs),
      {",".join(graph._tr_iter_sql(i) for i in range(1, graph.DG_ITERS + 1))}
      SELECT v, CAST(r AS BIGINT) AS r FROM t{graph.DG_ITERS}
      WHERE (SELECT k FROM trns) > 0"""
    want = {int(v): int(r) for v, r in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) == 4
