"""Every relational operator vs its DuckDB oracle at sf0.001."""

import pytest

from llm_scraper_spark.operators.relational import ORACLE_SQL, QUERIES
from tests.oracle_check import assert_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    assert name in ORACLE_SQL, f"{name} missing oracle SQL"
    df = QUERIES[name](spark, SF_DIR)
    assert_matches(df, ORACLE_SQL[name], SF_DIR, name)


def test_funnel_strict_ordering_on_hand_events(spark):
    """User A completes the full funnel in order; user B purchases
    BEFORE clicking (must not count); user C views only."""
    from llm_scraper_spark.operators.relational import (
        FUNNEL_SCALE,
        funnel_conversion,
    )
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        (2, "view", t(1)), (2, "purchase", t(2)), (2, "click", t(3)),
        (3, "view", t(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    row = funnel_conversion(spark, d).collect()[0]
    assert (row.n_viewed, row.n_clicked, row.n_purchased) == (3, 2, 1)
    assert row.click_rate_units == 2 * FUNNEL_SCALE // 3
    assert row.purchase_rate_units == FUNNEL_SCALE // 2


def test_skew_report_shows_hot_bucket_and_conserves_rows(spark):
    from llm_scraper_spark.operators.relational import (
        SKEW_SCALE,
        shuffle_skew_report,
    )

    out = shuffle_skew_report(spark, SF_DIR).collect()
    docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_rows for r in out) == docs_n
    # one imbalance value corpus-wide, > 1.0 because of the hot host
    imb = {r.imbalance_units for r in out}
    assert len(imb) == 1
    assert imb.pop() > SKEW_SCALE


def test_json_props_extracts_every_row(spark):
    from llm_scraper_spark.operators.relational import json_props_stats

    out = json_props_stats(spark, SF_DIR).collect()
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n for r in out) == ev_n  # every props row parses
    for r in out:
        assert 0 <= r.k_min <= r.k_max


def test_cohort_retention_week0_is_full(spark):
    """Every cohort is 100% retained at offset 0 (its own first week),
    and no offset exceeds it."""
    from llm_scraper_spark.operators.relational import (
        FUNNEL_SCALE,
        cohort_retention,
    )

    out = cohort_retention(spark, SF_DIR).collect()
    assert out
    by_cohort = {}
    for r in out:
        assert r.week_offset >= 0
        assert 0 < r.n_active <= r.cohort_size
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for rows in by_cohort.values():
        assert rows[0].retention_units == FUNNEL_SCALE
        assert rows[0].n_active == rows[0].cohort_size
