"""Snapshot analytics: CDX digest collapse + crawl round diff vs
pure-Python oracles on hand-built capture logs."""

import pytest

from llm_scraper_spark.operators import snapshots

SF_DIR = "/root/testdata/sf0.001"


def _py_collapse(caps):
    """Pure-Python CDX collapse=digest: caps = [(url, ts, digest)]."""
    out = []
    by_url = {}
    for url, ts, dg in sorted(caps):
        by_url.setdefault(url, []).append((ts, dg))
    for url, row in sorted(by_url.items()):
        prev = None
        ver = 0
        for ts, dg in row:
            if dg != prev:
                ver += 1
                out.append((url, ts, dg, ver))
                prev = dg
    return sorted(out)


HAND_CAPS = [
    # u1: A A B A  -> keep ts 1 (A), 3 (B), 4 (A): re-change back counts
    ("u1", 1, "A"), ("u1", 2, "A"), ("u1", 3, "B"), ("u1", 4, "A"),
    # u2: single capture
    ("u2", 7, "X"),
    # u3: all identical -> only the first kept
    ("u3", 1, "Z"), ("u3", 2, "Z"), ("u3", 3, "Z"),
    # u4: every capture distinct -> all kept
    ("u4", 1, "p"), ("u4", 2, "q"), ("u4", 3, "r"),
]


def test_collapse_captures_matches_python_oracle(spark):
    df = spark.createDataFrame(
        HAND_CAPS, "url string, ts_epoch long, digest string"
    )
    got = sorted(
        (r.url, r.ts_epoch, r.digest, r.version_no)
        for r in snapshots.collapse_captures(df).collect()
    )
    assert got == _py_collapse(HAND_CAPS)


def test_collapse_idempotent(spark):
    """Collapsing an already-collapsed log keeps every row (no two
    consecutive kept captures share a digest)."""
    df = spark.createDataFrame(
        HAND_CAPS, "url string, ts_epoch long, digest string"
    )
    once = snapshots.collapse_captures(df).drop("version_no")
    twice = snapshots.collapse_captures(once)
    assert twice.count() == once.count()


def test_crawl_round_diff_statuses(spark):
    a = spark.createDataFrame(
        [(1, 0, "d1"), (2, 0, "d2"), (3, 1, "d3")],
        "url_key long, host long, digest string",
    )
    b = spark.createDataFrame(
        [(1, 0, "d1"), (2, 0, "D2!"), (4, 1, "d4")],
        "url_key long, host long, digest string",
    )
    got = {
        r.url_key: r.status
        for r in snapshots.crawl_round_diff(a, b).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "gone", 4: "new"}


def test_delta_summary_partitions_universe(spark):
    """Every URL in either round lands in exactly one status bucket:
    per-host counts sum to the union-of-rounds size."""
    out = snapshots.crawl_delta_summary(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_a = docs.filter(f"{snapshots._A_PRED}").count()
    n_new = docs.filter("doc_id % 10 = 9").count()
    assert sum(r.n_total for r in out) == n_a + n_new
    for r in out:
        assert r.n_new + r.n_gone + r.n_changed + r.n_unchanged == r.n_total


@pytest.mark.parametrize("key", ["crawl_delta_summary", "cdx_collapse"])
def test_snapshot_oracles_match(spark, key):
    from tests.oracle_check import assert_matches

    df = snapshots.QUERIES[key](spark, SF_DIR)
    assert_matches(df, snapshots.ORACLE_SQL[key], SF_DIR, key)
