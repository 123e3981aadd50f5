"""KMV-HyperBall harmonic centrality: bit-exact DuckDB twin plus an
estimator-quality gate against an exact pure-Python truncated BFS."""

from collections import defaultdict

from llm_scraper_spark.operators.centrality import (
    HC_SCALE,
    HC_T,
    KMV_K,
    ORACLE_SQL,
    QUERIES,
    kmv_harmonic,
)
from llm_scraper_spark.operators.graph import PR_FANOUT
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


def test_harmonic_matches_duckdb(spark):
    assert_matches(
        QUERIES["harmonic_centrality_topk"](spark, SF_DIR),
        ORACLE_SQL["harmonic_centrality_topk"],
        SF_DIR,
        "harmonic_centrality_topk",
    )


def _exact_balls(n: int) -> dict[int, dict[int, int]]:
    """dist_to[v] = {u: d(u, v)} for d ≤ HC_T via forward BFS from
    every source over the deterministic (vid·31+j) mod n edge map."""
    adj = {
        vid: [(vid * 31 + j) % n for j in range(1, PR_FANOUT + 1)]
        for vid in range(n)
    }
    dist_to: dict[int, dict[int, int]] = defaultdict(dict)
    for u in range(n):
        frontier, seen = {u}, {u: 0}
        for d in range(1, HC_T + 1):
            nxt = set()
            for x in frontier:
                for y in adj[x]:
                    if y not in seen:
                        seen[y] = d
                        nxt.add(y)
            frontier = nxt
        for w, d in seen.items():
            if d >= 1:
                dist_to[w][u] = d
    return dist_to


def test_kmv_estimates_track_exact_bfs(spark):
    """The sketch is deterministic (md5 hashes), so its error against
    the exact truncated harmonic is a fixed number — pinned here with
    margin (measured at sf0.001: ball median 11.5% / p90 27% / max
    48%; harmonic median 9.2% / p90 23% / max 40%)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    got = {
        r["doc_id"]: (r["ball_est"], r["harmonic_units"])
        for r in kmv_harmonic(docs).collect()
    }
    ids = sorted(got)
    n = len(ids)
    dist_to = _exact_balls(n)
    ball_errs, harm_errs = [], []
    for vid, doc_id in enumerate(ids):
        exact_ball = 1 + len(dist_to[vid])
        est_ball, harm_units = got[doc_id]
        ball_errs.append(abs(est_ball - exact_ball) / exact_ball)
        exact_h = sum(1.0 / d for d in dist_to[vid].values())
        if exact_h > 0:
            harm_errs.append(abs(harm_units / HC_SCALE - exact_h) / exact_h)
        # below-k balls are counted exactly, not estimated
        if exact_ball < KMV_K:
            assert est_ball == exact_ball
    ball_errs.sort()
    harm_errs.sort()
    assert ball_errs[n // 2] <= 0.20
    assert ball_errs[int(n * 0.9)] <= 0.35
    assert max(ball_errs) <= 0.60
    assert harm_errs[len(harm_errs) // 2] <= 0.20
    assert max(harm_errs) <= 0.60


def test_kmv_estimates_are_monotone_in_radius(spark):
    """est_t is non-decreasing in t by construction (hashes are only
    ever added, so the k-th min only ever falls) — the property that
    makes the per-radius differences a valid ball decomposition."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    out = kmv_harmonic(docs)
    # negative hterm would have been clamped; instead assert the final
    # ball estimate is at least the radius-1 ball floor (fanout
    # in-edges, minus a possible self-loop) for every node
    bad = out.filter(F.col("ball_est") < PR_FANOUT).count()
    assert bad == 0
