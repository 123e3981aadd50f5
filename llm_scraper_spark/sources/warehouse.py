"""Bucketed warehouse tables: the storage-layout half of the scale
story.

Reference tie-in: the reference persists scraped rows into SQLite
tables keyed by URL/product id (server/scripts/analysis/db.py) and
re-reads them for every analysis pass — at 100 TB the equivalent is a
lakehouse table, and the layout decision that matters is BUCKETING:
pre-hash-partitioning a table on its join/dedup key at WRITE time so
every later join/aggregate on that key is exchange-free.

Why this is worth a module instead of a one-liner:

* A fact-to-fact join (documents ⋈ embeddings, frontier ⋈ seen-set)
  cannot broadcast either side; the default plan shuffles BOTH sides
  every run.  Writing both tables ``bucketBy(N, key)`` once amortizes
  that shuffle into the write: Spark records the bucketing in the
  catalog, and any join/groupBy on the bucket key reads co-located
  buckets with NO Exchange on either side (verified mechanically in
  tests/test_warehouse.py by asserting the physical plan).

* ``sortBy(key)`` inside each bucket additionally lets SortMergeJoin
  stream pre-sorted bucket files with no read-side Sort.  Spark ≥ 3.0
  does NOT propagate that ordering by default (SPARK-28595: with many
  files per bucket the order is per-file only, and trusting it forces
  single-file bucket reads); since this writer guarantees one file
  per bucket, a deployment that wants the sort elided sets
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — both
  behaviors are pinned in tests/test_warehouse.py.

* Bucket count is a LAYOUT constant, not a tuning knob: it must match
  between co-joined tables (Spark joins bucketed×bucketed
  exchange-free when counts are equal or one divides the other) and
  should be sized so one bucket ≈ 128-512 MB at the target scale.
  N_TABLE_BUCKETS=8 here is sandbox-sized; the constant is the single
  place a deployment retunes.

Spark only honors bucket metadata through the session catalog
(``saveAsTable``/``spark.table``), not bare ``parquet(path)`` reads —
so this module is deliberately catalog-first, with the warehouse
location owned by ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: buckets per table — sandbox-sized; see module docstring.
N_TABLE_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = N_TABLE_BUCKETS,
    sorted_buckets: bool = True,
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and per-bucket
    sorted) on ``key``.  Overwrites any previous layout of ``table``.

    The pre-write ``repartition(n_buckets, key)`` matters twice: it
    yields exactly ONE file per bucket (Spark only trusts — and thus
    only elides the read-side Sort for — per-bucket sort order when a
    bucket is a single file), and it prevents the many-small-files
    blowup of writing buckets from every input task."""
    df = df.repartition(n_buckets, key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sorted_buckets:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their shared bucket key.

    No hints, no repartition: when both tables are bucketed on ``key``
    with compatible counts the optimizer plans a SortMergeJoin whose
    children are bare bucketed scans — zero Exchange, zero Sort (when
    written ``sorted_buckets=True``).  The caller keeps the plain
    DataFrame API; layout does the work."""
    return spark.table(left).join(spark.table(right), key, how)
