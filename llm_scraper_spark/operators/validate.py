"""Triplet validation cascade — the reference's two-stage pipeline
(validation_pipeline.py:7-29): cheap search-count scoring for every
triple, expensive NLI entailment ONLY for triples the first stage
scores < 50.  The staged/conditional execution is preserved as a
filter-then-union plan (stage-2 UDF touches only the weak subset),
which is exactly how you keep an expensive model call off the hot path
at 100 TB.

Deterministic stand-ins (SURVEY §2.10):
- "search result count": md5-derived counts, max over the 5 phrasing
  variants (search_validation_playwright.py:62-77, A2);
- weight = normal/(normal+opposing) (…:79-82, A3);
- binary vote = normal_best > opposing_best (src/validators/
  search_validation.py:117-120, A4);
- "NLI entailment": md5-derived 0-100 score, max over candidate
  sentences with the ≥100 direct-match early exit analog
  (llm_validation_playwright.py:90-107, A5).

Everything is one pandas UDF per stage (Arrow-batched) + JVM-side
arithmetic; no per-row Python.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_VARIANTS = 5


def _count(seed: str) -> int:
    d = hashlib.md5(seed.encode()).digest()
    return int.from_bytes(d[:4], "big") % 1_000_000


def search_counts(triple_key: str) -> tuple[int, int]:
    """Best normal / opposing synthetic search counts over 5 phrasings."""
    normal = max(_count(f"n{v}|{triple_key}") for v in range(N_VARIANTS))
    opposing = max(_count(f"o{v}|{triple_key}") for v in range(N_VARIANTS))
    return normal, opposing


def nli_score(triple_key: str) -> float:
    """Deterministic entailment %, max over 3 candidate sentences."""
    return float(
        max(
            int.from_bytes(hashlib.md5(f"nli{s}|{triple_key}".encode()).digest()[:2], "big")
            % 101
            for s in range(3)
        )
    )


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("normal_best", T.LongType()),
            T.StructField("opposing_best", T.LongType()),
        ]
    )
)
def search_counts_udf(key: pd.Series) -> pd.DataFrame:
    pairs = [search_counts(k) for k in key]
    return pd.DataFrame(
        {"normal_best": [p[0] for p in pairs], "opposing_best": [p[1] for p in pairs]}
    )


@F.pandas_udf(T.DoubleType())
def nli_score_udf(key: pd.Series) -> pd.Series:
    return key.map(nli_score)


def validate_triplets(triplets: DataFrame) -> DataFrame:
    """Adds weight / vote / validation_method columns via the cascade."""
    key = F.concat_ws("|", "subj_type", "subj", "predicate", "obj_type", "obj")
    t = triplets.withColumn("_k", key).withColumn("_sc", search_counts_udf("_k"))
    t = t.select(
        "*",
        F.col("_sc.normal_best").alias("normal_best"),
        F.col("_sc.opposing_best").alias("opposing_best"),
    ).drop("_sc")
    w1 = (
        F.col("normal_best").cast("double")
        / (F.col("normal_best") + F.col("opposing_best")).cast("double")
        * 100.0
    )
    t = t.withColumn("search_weight", w1)
    # cascade: stage-2 only where stage-1 is weak (<50)
    strong = t.filter(F.col("search_weight") >= 50).withColumn(
        "weight", F.col("search_weight")
    ).withColumn("validation_method", F.lit("search"))
    weak = t.filter(F.col("search_weight") < 50).withColumn(
        "weight", nli_score_udf("_k")
    ).withColumn("validation_method", F.lit("nli"))
    out = strong.unionByName(weak)
    return (
        out.withColumn(
            "vote",
            F.when(F.col("normal_best") > F.col("opposing_best"), 1)
            .otherwise(0)
            .cast("long"),
        )
        .drop("_k")
    )
