"""Two-phase salted per-group top-k — the shared serving-path ranker.

A single window on the group key alone funnels the whole scored
stream into |groups| partitions (hot-partition bottleneck at corpus
scale: one task per query sees every candidate).  Phase 1 ranks
within (group, salt) — `salts`× more, evenly-sized partitions — and
keeps each salt's top-k; the global top-k is provably a subset of
that union (every kept row beats all dropped rows of its own salt
under the given total order).  Phase 2 ranks the ≤ salts×k survivors
per group — trivial.

Used by the PQ/SQ8 ADC scans and BM25 (operators/pq.py, sq8.py,
search.py); the ordering columns MUST form a total order within a
group (ties broken by a unique id) or phase 1's subset argument
fails.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    scored: DataFrame,
    group_col: str,
    order_cols: list[Column],
    k: int,
    salt_src: str,
    salts: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows per `group_col` under `order_cols`, ranked 1..k in
    `rank_name`, output ordered (group, rank).  `salt_src` must be a
    unique-ish integer column (the tie-break id) — it seeds the
    phase-1 salt."""
    ws = Window.partitionBy(group_col, "salt").orderBy(*order_cols)
    survivors = (
        scored.withColumn("salt", F.pmod(F.col(salt_src), F.lit(salts)))
        .withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= k)
        .drop("salt", "srank")
    )
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_name, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_name) <= k)
        .orderBy(group_col, rank_name)
    )
