"""Count-Min sketch: one-sided guarantee, mergeability, and the
driver-gate twin."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators import sketches

SF_DIR = "/root/testdata/sf0.001"


def _items(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        f"{sketches._HOST_SPARK} AS key", "event_id"
    )


def test_cms_never_underestimates(spark):
    """estimate ≥ exact for EVERY key — the CMS one-sided guarantee."""
    items = _items(spark).select("key")
    sketch = sketches.cms_build(items)
    exact = items.groupBy("key").agg(F.count("*").alias("exact_cnt"))
    est = sketches.cms_estimate(sketch, exact.select("key"))
    bad = exact.join(est, "key").filter("cms_cnt < exact_cnt").count()
    assert bad == 0


def test_cms_sketch_is_bounded_and_positive(spark):
    sketch = sketches.cms_build(_items(spark).select("key")).collect()
    assert len(sketch) <= sketches.CMS_D * sketches.CMS_W
    assert all(r.cnt > 0 for r in sketch)
    assert all(0 <= r.cell < sketches.CMS_W for r in sketch)


def test_cms_merges_by_cellwise_sum(spark):
    """The sketch of a union equals the cell-wise sum of the shard
    sketches — the property that makes per-round/per-shard maintenance
    free at 100 TB."""
    items = _items(spark)
    a = items.filter("event_id % 2 = 0").select("key")
    b = items.filter("event_id % 2 = 1").select("key")
    merged = (
        sketches.cms_build(a)
        .unionByName(sketches.cms_build(b))
        .groupBy("d", "cell")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = sketches.cms_build(items.select("key"))
    sym_diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert sym_diff == 0


def test_cms_heavy_hitters_finds_hot_host(spark):
    out = sketches.cms_heavy_hitters(spark, SF_DIR).collect()
    assert out, "the planted ~35% hot host must qualify"
    assert out[0].host == "site0"  # hottest by construction
    assert all(r.overcount >= 0 for r in out)


def test_cms_oracle_matches(spark):
    from tests.oracle_check import assert_matches

    df = sketches.QUERIES["cms_heavy_hitters"](spark, SF_DIR)
    assert_matches(
        df, sketches.ORACLE_SQL["cms_heavy_hitters"], SF_DIR,
        "cms_heavy_hitters",
    )


def test_kmv_estimates_within_tolerance(spark):
    """KMV union/intersection estimates land within ±35% of exact at
    k=64 (σ ≈ 1/√k ≈ 12.5%; ±35% ≈ 3σ) and the Jaccard numerator is
    exact for sketch members."""
    from llm_scraper_spark.operators.sketches import kmv_intersection

    r = kmv_intersection(spark, SF_DIR).collect()[0]
    assert r.exact_inter > 0 and r.exact_union > r.exact_inter
    assert abs(r.est_union - r.exact_union) <= 0.35 * r.exact_union
    assert abs(r.est_inter - r.exact_inter) <= 0.35 * r.exact_union
    assert 0 <= r.n_both <= 64


def test_kmv_oracle_matches(spark):
    from tests.oracle_check import assert_matches

    from llm_scraper_spark.operators import sketches

    assert_matches(
        sketches.QUERIES["kmv_intersection"](spark, SF_DIR),
        sketches.ORACLE_SQL["kmv_intersection"],
        SF_DIR,
        "kmv_intersection",
    )


def test_kmv_nonfull_sketch_returns_exact(spark, tmp_path):
    """ADVICE r3 regression: when |A∪B| < KMV_K the union sketch is
    the WHOLE union — the order-statistic extrapolation is biased and
    the exact values are in hand.  Both engines must return them."""
    import os

    from tests.oracle_check import assert_matches

    from llm_scraper_spark.operators import sketches

    src = "/root/testdata/sf0.001"
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        os.symlink(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    spark.read.parquet(f"{src}/documents.parquet").filter(
        "doc_id < 40"
    ).toPandas().to_parquet(tmp_path / "documents.parquet")
    df = sketches.kmv_intersection(spark, str(tmp_path))
    assert_matches(
        df, sketches.ORACLE_SQL["kmv_intersection"], str(tmp_path),
        "kmv_nonfull",
    )
    r = df.collect()[0]
    assert r.est_union == r.exact_union  # 40 < KMV_K: sketch is exact
    assert r.est_inter == r.exact_inter
