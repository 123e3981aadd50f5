"""Property-graph build (the reference's ArangoDB ``createKG`` sink,
src/database/db.py:207-469, re-expressed as DataFrame transforms):

  triplets → global dedup (db.py:448 ``set(triplets)``)
           → endpoint-type validation (db.py:453-455, P7)
           → vertices: union of subj/obj projections, node-key
             canonicalization (db.py:46-50,66: strip whitespace,
             forbidden chars → '_'), insert-if-absent dedup
             (db.py:76-79) = dropDuplicates on key
           → edges: endpoint resolution joins (db.py:91-95, J2) —
             broadcast hash joins (the vertex dim is small relative to
             edges at any scale; if not, Catalyst falls back to SMJ)
  degree top-k (A1/O2): the AQL degree query
  (search_validation_playwright.py:214-226) as groupBy+count+limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EDGE_TYPES, NODE_TYPES

# key = regexp_replace(strip-all-whitespace, forbidden, '_') — JVM-side
def _key(col):
    return F.regexp_replace(F.regexp_replace(col, r"\s+", ""), "[^a-zA-Z0-9_-]", "_")


def build_kg(triplets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """triplets(url, subj_type, subj, predicate, obj_type, obj[, weight])
    → (vertices(key,type,name), edges(src_key,dst_key,relationship,weight))."""
    t = triplets.dropDuplicates(
        ["subj_type", "subj", "predicate", "obj_type", "obj"]
    ).filter(
        F.col("subj_type").isin(NODE_TYPES)
        & F.col("obj_type").isin(NODE_TYPES)
        & F.col("predicate").isin(EDGE_TYPES)
    )
    if "weight" not in t.columns:
        t = t.withColumn("weight", F.lit(1.0))
    subj_v = t.select(
        _key(F.col("subj")).alias("key"),
        F.col("subj_type").alias("type"),
        F.col("subj").alias("name"),
    )
    obj_v = t.select(
        _key(F.col("obj")).alias("key"),
        F.col("obj_type").alias("type"),
        F.col("obj").alias("name"),
    )
    vertices = subj_v.unionByName(obj_v).dropDuplicates(["key"])
    edges = t.select(
        _key(F.col("subj")).alias("src_key"),
        _key(F.col("obj")).alias("dst_key"),
        F.col("predicate").alias("relationship"),
        "weight",
    ).dropDuplicates(["src_key", "dst_key", "relationship"])
    # endpoint-existence validation joins (J2) — semantically the
    # insert-time lookups (reference db.py:91-95).  shuffle_hash, NOT
    # broadcast: the vertex set grows with the corpus (billions of keys
    # at 10^10 docs), so an explicit broadcast hint — which Catalyst
    # obeys unconditionally — is a driver/executor OOM at scale; a
    # shuffle-hash semi-join on the key is linear and co-partitioned
    # with the second lookup.
    v_keys = vertices.select("key")
    edges = edges.join(
        v_keys.withColumnRenamed("key", "src_key").hint("shuffle_hash"),
        "src_key",
        "left_semi",
    ).join(
        v_keys.withColumnRenamed("key", "dst_key").hint("shuffle_hash"),
        "dst_key",
        "left_semi",
    )
    return vertices, edges


def degree_topk(edges: DataFrame, k: int = 10) -> DataFrame:
    """Inbound-degree top-k (AQL analog) — partial+final hash agg then
    TakeOrderedAndProject; deterministic tie-break on key."""
    return (
        edges.groupBy(F.col("dst_key").alias("key"))
        .agg(F.count("*").cast("long").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("key"))
        .limit(k)
    )
