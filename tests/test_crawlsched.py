"""Crawl-scheduler suite: DuckDB twins, planted DUST rules, HITS
fixed-point sanity, recrawl-interval bounds."""

import pytest

from llm_scraper_spark.operators.crawlsched import (
    HITS_SCALE,
    MIN_SUPPORT,
    ORACLE_SQL,
    QUERIES,
    RC_MAX_H,
)
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_crawlsched_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_dust_learns_planted_alias_rules(spark):
    rules = {
        (r["alpha"], r["beta"]): r["support"]
        for r in QUERIES["dust_rules"](spark, SF_DIR).collect()
    }
    # the three alias families the synthetic universe plants; each pair
    # splits at the longest-common-prefix/suffix boundary
    assert ("", "index.html") in rules          # …/ vs …/index.html
    assert ("", "s") in rules                   # http:// vs https://
    assert ("", "?sid=abc123") in rules         # session-id parameter
    assert all(s >= MIN_SUPPORT for s in rules.values())
    # cross-family pairs embedding a doc_id in the middle are one-off
    # middles and must have died at the support filter
    assert not any("page" in a or "page" in b for a, b in rules)


def test_hits_scores_nontrivial_and_bounded(spark):
    from llm_scraper_spark.operators.crawlsched import hits_scores

    topk = QUERIES["hits_topk"](spark, SF_DIR).collect()
    assert len(topk) == 20
    for r in topk:
        assert 0 <= r["auth_units"] <= HITS_SCALE
        assert 0 <= r["hub_units"] <= HITS_SCALE
    # the 2-to-1 edge map skews in-degree, so the fixpoint is not
    # uniform across the full graph (the top-20 may tie at the rescale
    # ceiling — that's expected; a bijective map would put EVERY vertex
    # there, which is what this rules out)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    all_scores = hits_scores(docs).collect()
    assert len({r["auth_units"] for r in all_scores}) > 1
    assert len({r["hub_units"] for r in all_scores}) > 1


def test_recrawl_interval_bounds_and_monotonicity(spark):
    rows = QUERIES["recrawl_schedule"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["next_interval_h"] <= RC_MAX_H
        assert (
            r["next_fetch_epoch"] % 3600
            == (r["next_fetch_epoch"] - r["next_interval_h"] * 3600) % 3600
        )
    # frequently-changing URLs are revisited sooner: compare the
    # all-change and no-change extremes when both exist
    hot = [r for r in rows if r["n_changes"] == r["n_obs"]]
    cold = [r for r in rows if r["n_changes"] == 0]
    if hot and cold:
        assert max(h["next_interval_h"] for h in hot) <= min(
            c["next_interval_h"] for c in cold
        )


def test_anchor_topk_shape_and_budget(spark):
    from llm_scraper_spark.operators.crawlsched import (
        ANCHOR_FANOUT,
        ANCHOR_TOPK,
    )

    rows = QUERIES["anchor_text_topk"](spark, SF_DIR).collect()
    assert rows
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in per_doc.items():
        assert len(rs) <= ANCHOR_TOPK
        # in_links is a per-target constant and bounds every term count
        assert len({r["in_links"] for r in rs}) == 1
        assert all(r["n"] <= r["in_links"] for r in rs)
        # rows come back count-desc, term-asc
        pairs = [(-r["n"], r["term"]) for r in rs]
        assert pairs == sorted(pairs)
    # every link in the graph lands in exactly one target's in_links
    # (anchors from short source pages are dropped, hence <=)
    assert (
        sum(rs[0]["in_links"] for rs in per_doc.values())
        <= n_docs * ANCHOR_FANOUT
    )


def test_budget_allocation_is_exact_hamilton(spark):
    """Σbudget == G exactly; every budget ∈ {base, base+1}; the +1s go
    to the largest remainders — checked against a plain-int oracle on
    a skewed hand rank table."""
    from llm_scraper_spark.operators.crawlsched import allocate_budget

    ranks = [(0, 700), (1, 150), (2, 100), (3, 35), (4, 10), (5, 5)]
    g = 333
    df = spark.createDataFrame(ranks, "host long, rank_units long")
    got = {r.host: r.budget for r in allocate_budget(df, g).collect()}
    # plain-int Hamilton oracle
    total = sum(r for _, r in ranks)
    base = {h: g * r // total for h, r in ranks}
    rem = {h: (g * r) % total for h, r in ranks}
    left = g - sum(base.values())
    order = sorted(ranks, key=lambda hr: (-rem[hr[0]], hr[0]))
    expect = dict(base)
    for h, _ in order[:left]:
        expect[h] += 1
    assert got == expect
    assert sum(got.values()) == g


def test_budget_allocation_zero_total_rank_is_empty(spark):
    from llm_scraper_spark.operators.crawlsched import allocate_budget

    df = spark.createDataFrame([(0, 0), (1, 0)], "host long, rank_units long")
    assert allocate_budget(df, 100).count() == 0


def test_dust_apply_converges_alias_families(spark):
    """Applying the mined rules collapses the systematic alias
    spellings: every index.html / ?sid variant rewrites to a spelling
    already in the universe, shrinking the distinct-URL count."""
    from llm_scraper_spark.operators.crawlsched import dust_apply

    out = dust_apply(spark, SF_DIR).collect()
    urls = {r.url for r in out}
    canon = {r.canon_url for r in out}
    assert len(canon) < len(urls)
    rewritten = {r.url: r.canon_url for r in out if r.rewritten}
    assert rewritten, "systematic rules must fire"
    for u, c in rewritten.items():
        assert "index.html" in u or "?sid=" in u
        assert "index.html" not in c and "?sid=" not in c
    # untouched URLs pass through verbatim
    for r in out:
        if not r.rewritten:
            assert r.canon_url == r.url


def test_token_bucket_hand_log(spark):
    """Burst → starvation → gap-refill (capped) against a plain-int
    oracle; conservation admitted + dropped == arrivals everywhere."""
    from llm_scraper_spark.operators.crawlsched import (
        TB_CAP,
        TB_REFILL,
        token_bucket_fold,
    )

    log = [
        (1, 10, 8),   # burst over capacity: admit CAP=5, drop 3
        (1, 11, 2),   # refill 3 -> 3 tokens, admit 2
        (1, 15, 9),   # 4-slot gap: refill 12 capped at CAP, admit 5
        (2, 10, 1),   # independent host
    ]
    df = spark.createDataFrame(log, "host long, slot long, arrivals long")
    got = {
        (r.host, r.slot): (r.admitted, r.dropped, r.tokens_after)
        for r in token_bucket_fold(df).collect()
    }
    # plain-int oracle
    expect = {}
    state = {}
    for h, s, a in sorted(log):
        t, prev = state.get(h, (TB_CAP, None))
        if prev is not None:
            t = min(TB_CAP, t + (s - prev) * TB_REFILL)
        adm = min(a, t)
        expect[(h, s)] = (adm, a - adm, t - adm)
        state[h] = (t - adm, s)
    assert got == expect
    assert got[(1, 10)] == (5, 3, 0)
    assert got[(1, 15)] == (5, 4, 0)
    for (h, s), (adm, drp, _) in got.items():
        arr = dict(((x, y), z) for x, y, z in log)[(h, s)]
        assert adm + drp == arr


def test_dust_apply_host_keyed_join_handles_skewed_rules(spark):
    """r3 scale fix: the rule table grows with hosts, so `dust_apply`
    must EQUI-join on host (contains as residual), never broadcast-
    nested-loop over the whole rule universe.  One template-heavy host
    carries 30 rules; the best-support rule must win there, other
    hosts' rules must never fire cross-host, and the plan must carry a
    real hash join on the host key."""
    from llm_scraper_spark.operators.crawlsched import apply_dust_rules

    urls = spark.createDataFrame(
        [
            ("https://heavy.example.com/a/x9/page", "heavy.example.com"),
            ("https://light.example.com/a/x9/page", "light.example.com"),
            ("https://light.example.com/clean", "light.example.com"),
        ],
        "url string, host string",
    )
    rules = spark.createDataFrame(
        # 30 rules on the heavy host, all matching /x9/: support 1..30
        [("heavy.example.com", f"/y{i}/", "/x9/", i) for i in range(1, 31)]
        # a cross-host rule that would also match — must not fire
        + [("other.example.com", "/zzz/", "/x9/", 99)],
        "host string, alpha string, beta string, support long",
    )
    out = {r.url: r for r in apply_dust_rules(urls, rules).collect()}
    heavy = out["https://heavy.example.com/a/x9/page"]
    assert heavy.rewritten and heavy.canon_url == (
        "https://heavy.example.com/a/y30/page"
    )  # highest support wins
    light = out["https://light.example.com/a/x9/page"]
    assert not light.rewritten  # other hosts' rules never cross over
    assert not out["https://light.example.com/clean"].rewritten
    plan = (
        apply_dust_rules(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan
