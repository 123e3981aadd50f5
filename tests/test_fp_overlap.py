"""fp_overlap_pairs: planted shared-run guarantee and hot-print cap."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators import textstats
from llm_scraper_spark.operators.textstats import (
    FP_K,
    FP_MAX_POSTINGS,
    FP_W,
    OVERLAP_MIN,
    fp_overlap_pairs,
    winnow_fps,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_planted_shared_run_is_detected(spark, tmp_path):
    """SWA guarantee: two docs sharing a contiguous run of
    ≥ FP_W + FP_K - 1 words share at least one selected print.  Plant
    two disjoint runs so the pair clears OVERLAP_MIN."""
    run1 = " ".join(f"alpha{i}" for i in range(FP_W + FP_K - 1))
    run2 = " ".join(f"beta{i}" for i in range(FP_W + FP_K - 1))
    filler_a = " ".join(f"fa{i}" for i in range(15))
    filler_b = " ".join(f"fb{i}" for i in range(15))
    rows = [
        (1, f"{filler_a} {run1} {filler_a} {run2}"),
        (2, f"{run1} {filler_b} {run2} {filler_b}"),
        (3, f"{filler_b} quiet unrelated text {filler_a}"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in
           fp_overlap_pairs(spark, sf).collect()}
    assert (1, 2) in got
    assert got[(1, 2)] >= OVERLAP_MIN


def test_hot_print_capped_out(spark, tmp_path):
    """A print shared by more than FP_MAX_POSTINGS docs is boilerplate
    — it must produce NO pairs on its own."""
    boiler = " ".join(f"common{i}" for i in range(FP_W + FP_K - 1))
    rows = [
        (i, f"{boiler} tail{i}a tail{i}b tail{i}c")
        for i in range(FP_MAX_POSTINGS + 10)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    # sanity: the boilerplate run really is shared by every doc
    shared = (
        winnow_fps(spark.read.parquet(f"{sf}/documents.parquet"))
        .select(F.explode("fps").alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > FP_MAX_POSTINGS)
        .count()
    )
    assert shared > 0
    assert fp_overlap_pairs(spark, sf).count() == 0


def test_registered():
    import __spark_entry__ as entry

    assert "fp_overlap_pairs" in entry.queries()
    assert "fp_overlap_pairs" in entry.oracle_sql()
    assert textstats.ORACLE_SQL["fp_overlap_pairs"]
