"""Remaining SURVEY.md §2 reference-operator twins with DuckDB oracles.

Covers the inventory rows not already in relational.py:

  J1  content⋈annotations by key   (precision_recall.py:32-47)
  A5  entailment max + early exit  (llm_validation_playwright.py:90-107)
  A8  fuzzy precision count        (precision_recall.py:334-348)
  A9  multi-judge vote majority    (validation/mult_validation.py:16-54)
  O5  opposing-variant cap ≤3      (search_validation_playwright.py:199-200)
  P2-P8 predicate battery          (scrape_eccomerce.py:66-74,109,209;
                                    extract_product_urls.py:114-132;
                                    llm_validation_playwright.py:95-97)
  F12 URL parse suite              (extract_product_urls.py:28;
                                    scrapping_manager.py:94-97)
  S9/J2/A1 property-graph build + degree top-k (src/database/db.py:207-469)

Deterministic stand-ins (SURVEY §2.10): the reference's model calls
(NLI score, fuzzy ratio, judge vote) become md5-derived or
containment-based scores computed identically in Spark and DuckDB, so
the *dataflow shape* (staged filters, explode×keyword joins, majority
aggregation) is real and oracle-checked even though the model is fake.

md5-int bridge used throughout:
  Spark:  cast(conv(substr(md5(s),1,8),16,10) as bigint)
  DuckDB: CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .graph import build_kg, degree_topk
from .validate import validate_triplets

KEYWORDS = ["spark", "hash", "window", "vector", "stream"]
SENT_SEP = " the "  # synthetic-corpus "sentence" delimiter
N_JUDGES = 3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _md5_int(col) -> F.Column:
    return F.expr(f"cast(conv(substr(md5({col}), 1, 8), 16, 10) as bigint)")


# ------------------------------------------------------------------- J1
def j1_content_annotation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content left-joined to its per-key annotations (the reference
    keys extracted text and triplets by URL in a dict,
    precision_recall.py:32-47).  documents.doc_id ⟕ embeddings.vec_id;
    the annotation side carries the label."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("label").cast("long").alias("label")
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "left")
        .select(
            "doc_id",
            "lang",
            "label",
            F.col("label").isNotNull().alias("has_annotation"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- A5
def a5_entailment_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entailment max over candidate sentences with the direct-match
    early exit (llm_validation_playwright.py:90-107): sentences =
    SENT_SEP splits ≥20 chars (P8 gate, :95-97); a sentence containing
    'spark' short-circuits to 100, else an md5-derived 0-99 score;
    per-doc max."""
    docs = _t(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), SENT_SEP)).alias("sent")
    ).filter(F.length("sent") >= 20)
    score = F.when(
        F.col("sent").contains("spark"), F.lit(100).cast("long")
    ).otherwise(_md5_int("sent") % 100)
    return (
        sents.select("doc_id", score.alias("score"))
        .groupBy("doc_id")
        .agg(
            F.max("score").cast("long").alias("entail_score"),
            F.count("*").cast("long").alias("n_candidates"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- A8
def a8_fuzzy_precision_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-precision count (precision_recall.py:334-348): explode the
    doc × keyword grid (broadcast keyword dim), 'fuzzy match' stand-in
    = substring containment, count distinct matched keywords per doc.
    Zero-match docs are kept (count of NULL = 0)."""
    docs = _t(spark, sf_dir, "documents")
    kws = spark.createDataFrame([(k,) for k in KEYWORDS], "kw string")
    hit = F.when(F.col("text").contains(F.col("kw")), F.col("kw"))
    return (
        docs.join(F.broadcast(kws))
        .groupBy("doc_id")
        .agg(F.count_distinct(hit).cast("long").alias("n_matched"))
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- A9
def a9_vote_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-judge majority vote + mean confidence
    (mult_validation.py:16-54): N_JUDGES deterministic judges per doc,
    vote = md5 parity, confidence = md5-derived 0-99/100; majority iff
    yes-votes > N/2.  Confidence mean is an exact integer-sum ratio."""
    docs = _t(spark, sf_dir, "documents")
    judges = spark.createDataFrame([(j,) for j in range(N_JUDGES)], "judge int")
    seed = "concat(cast(doc_id as string), ':', cast(judge as string))"
    vote = F.expr(f"cast(conv(substr(md5({seed}), 1, 8), 16, 10) as bigint)") % 2
    conf = F.expr(f"cast(conv(substr(md5(concat({seed}, ':c')), 1, 8), 16, 10) as bigint)") % 100
    per = docs.join(F.broadcast(judges)).select(
        "doc_id", vote.alias("vote"), conf.alias("conf")
    )
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("vote").cast("long").alias("n_yes"),
            (F.sum("conf").cast("double") / F.lit(N_JUDGES * 100)).alias("avg_conf"),
        )
        .withColumn("majority", F.col("n_yes") * 2 > N_JUDGES)
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- O5
def o5_variant_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opposing-variant cap (search_validation_playwright.py:199-200):
    at most 3 'corrupted variants' per key, chosen in a deterministic
    md5 shuffle order — row_number ≤ 3 per group."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    order_key = F.md5(F.concat(F.lit("cap:"), F.col("event_id").cast("string")))
    w = Window.partitionBy("user_id").orderBy(order_key.asc(), F.col("event_id").asc())
    return (
        ev.select(
            "user_id",
            "event_id",
            order_key.alias("variant_key"),
        )
        .withColumn("variant_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("variant_rank") <= 3)
        .orderBy("user_id", "variant_rank")
    )


# ------------------------------------------------------------- P2-P8
def p_predicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate/projection battery over documents:
    P2 whitespace flatten to '|' (scrape_eccomerce.py:109),
    P3 skip-selector drop: text containing ' error ' (…:66-74),
    P4 empty-content guard (…:209),
    P5 relative-href absolutize (extract_product_urls.py:114-132),
    P8 min-length gate (llm_validation_playwright.py:95-97).
    The two predicates filter; the projections ride along."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text") != "")                       # P4
        .filter(~F.col("text").contains(" error "))            # P3
        .filter(F.col("n_chars") >= 200)                       # P8
        .select(
            "doc_id",
            F.regexp_replace(F.trim(F.col("text")), r"\s+", "|").alias("flat_text"),
            F.concat(
                F.lit("https://example.com"),
                F.concat(F.lit("/doc/"), F.col("doc_id").cast("string")),
            ).alias("abs_url"),                                # P5
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------ F12
def f12_url_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-function suite (F12: urljoin/urlparse analogs) —
    host/path/query extraction stays JVM-side via parse_url."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/path/"),
        F.col("doc_id").cast("string"),
        F.lit("?q=1"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
    ).orderBy("doc_id")


# ------------------------------------------------------- S9 / J2 / A1
def _kg_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic triplet derivation over testdata: every customer
    'communicatesWith' its nation (device → manufacturer in the
    reference's type system, db.py:442-443)."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select(
        F.lit("device").alias("subj_type"),
        F.col("c_name").alias("subj"),
        F.lit("communicatesWith").alias("predicate"),
        F.lit("manufacturer").alias("obj_type"),
        F.col("n_name").alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit("synthetic://kg").alias("url"),
    )


def kg_vertex_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex build (S9): union of endpoint projections, node-key
    canonicalization, insert-if-absent dedup — summarized per type."""
    vertices, _ = build_kg(_kg_triplets(spark, sf_dir))
    return (
        vertices.groupBy("type")
        .agg(F.count("*").cast("long").alias("n_vertices"))
        .orderBy("type")
    )


def kg_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge build + endpoint-validation joins (J2) + inbound-degree
    top-k (A1): customers-per-nation through the KG pipeline."""
    _, edges = build_kg(_kg_triplets(spark, sf_dir))
    return degree_topk(edges, k=10)


# ----------------------------------------------- triplet reconciliation
#: synonym → allowed-vocabulary maps (merge_duplicate.py:29-91: the
#: LLM is asked to map near-synonym relations/types onto the graph's
#: existing vertex/edge collections, "madeBy" → "manufacturedBy";
#: deterministic here, per the repo's no-LLM discipline).  These dims
#: are BOUNDED vocabularies (the reference's NODE_TYPES/EDGE_TYPES
#: lists), so broadcasting them is correct — unlike corpus-scaling
#: inputs, which this repo never broadcasts.
_REL_SYNONYMS = [
    ("madeBy", "manufactures"),
    ("manufacturedBy", "manufactures"),
    ("produces", "manufactures"),
    ("watches", "observes"),
    ("monitors", "observes"),
    ("gathers", "collects"),
    ("includes", "contains"),
    ("enables", "supports"),
]
_TYPE_SYNONYMS = [
    ("gadget", "device"),
    ("appliance", "device"),
    ("maker", "manufacturer"),
    ("vendor", "manufacturer"),
    ("reading", "observation"),
    ("measurement", "observation"),
    ("app", "application"),
    ("policy", "privacyPolicy"),
]
_DIRTY_PREDS = ["manufactures", "madeBy", "watches", "gathers", "includes",
                "enables", "linksTo"]
_DIRTY_STYPES = ["device", "gadget", "maker", "reading", "app", "widget"]
_DIRTY_OTYPES = ["observation", "measurement", "appliance", "policy", "thing"]


def kg_reconcile_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5-shape synonym canonicalization (merge_duplicate.py:29-91):
    map near-synonym relation/entity types onto the allowed KG
    vocabulary via broadcast dim joins; unmatched names pass through
    unchanged (the reference's "otherwise leave it unchanged" rule —
    left join + coalesce).  Dirty triplets are synthesized
    deterministically from the documents table (same CTE in the
    DuckDB twin)."""
    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")

    def pick(options: list[str], mod: int):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (F.col("doc_id") % mod + 1).cast("int"),
        )

    dirty = docs.select(
        "doc_id",
        F.coalesce(F.try_element_at(w, F.lit(1)), F.lit("x")).alias("subj"),
        F.coalesce(F.try_element_at(w, F.lit(2)), F.lit("x")).alias("obj"),
        pick(_DIRTY_PREDS, 7).alias("dirty_pred"),
        pick(_DIRTY_STYPES, 6).alias("dirty_stype"),
        pick(_DIRTY_OTYPES, 5).alias("dirty_otype"),
    )
    rel_map = spark.createDataFrame(_REL_SYNONYMS, "syn string, canon string")
    type_map = spark.createDataFrame(_TYPE_SYNONYMS, "syn string, canon string")
    out = (
        dirty.join(
            F.broadcast(rel_map.withColumnRenamed("canon", "rel_canon")),
            dirty.dirty_pred == rel_map.syn,
            "left",
        )
        .drop("syn")
        .join(
            F.broadcast(
                type_map.select(
                    F.col("syn").alias("s_syn"), F.col("canon").alias("s_canon")
                )
            ),
            F.col("dirty_stype") == F.col("s_syn"),
            "left",
        )
        .join(
            F.broadcast(
                type_map.select(
                    F.col("syn").alias("o_syn"), F.col("canon").alias("o_canon")
                )
            ),
            F.col("dirty_otype") == F.col("o_syn"),
            "left",
        )
    )
    changed = (
        F.when(F.col("rel_canon").isNotNull(), 1).otherwise(0)
        + F.when(F.col("s_canon").isNotNull(), 1).otherwise(0)
        + F.when(F.col("o_canon").isNotNull(), 1).otherwise(0)
    )
    return out.select(
        "doc_id",
        "subj",
        F.coalesce(F.col("s_canon"), F.col("dirty_stype")).alias("subj_type"),
        F.coalesce(F.col("rel_canon"), F.col("dirty_pred")).alias("predicate"),
        F.coalesce(F.col("o_canon"), F.col("dirty_otype")).alias("obj_type"),
        "obj",
        changed.cast("long").alias("n_reconciled"),
    ).orderBy("doc_id")


# ------------------------------------------------------- A2-A5 cascade
def validation_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-stage validation cascade (validation_pipeline.py:
    7-29) over derived triplets: cheap search-count scoring for all,
    expensive NLI only for the weak (<50) subset — the staged plan that
    keeps the expensive UDF off the hot path.  The pandas-UDF scores
    are md5-derived, so the oracle reproduces them in pure SQL."""
    out = validate_triplets(_kg_triplets(spark, sf_dir))
    return out.select(
        "subj",
        "obj",
        F.col("normal_best").cast("long").alias("normal_best"),
        F.col("opposing_best").cast("long").alias("opposing_best"),
        "search_weight",
        F.col("weight").cast("double").alias("weight"),
        "validation_method",
        "vote",
    ).orderBy("subj", "obj")


# ------------------------------------------------------------------ SQL
_KG_TRIP_SQL = """
  trip AS (
    SELECT DISTINCT
           'device' AS subj_type, c_name AS subj,
           'communicatesWith' AS predicate,
           'manufacturer' AS obj_type, n_name AS obj, 1.0 AS weight
    FROM customer JOIN nation ON c_nationkey = n_nationkey
  ),
  keyed AS (
    SELECT regexp_replace(regexp_replace(subj, '\\s+', '', 'g'),
                          '[^a-zA-Z0-9_-]', '_', 'g') AS src_key,
           regexp_replace(regexp_replace(obj, '\\s+', '', 'g'),
                          '[^a-zA-Z0-9_-]', '_', 'g') AS dst_key,
           subj_type, subj, obj_type, obj, predicate, weight
    FROM trip
  )
"""

def _md5mod_sql(seed_expr: str, hexlen: int, mod: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({seed_expr}), 1, {hexlen})) AS BIGINT) % {mod}"
    )


_KEY_SQL = "subj_type || '|' || subj || '|' || predicate || '|' || obj_type || '|' || obj"
_NORMAL_SQL = "GREATEST(" + ", ".join(
    _md5mod_sql(f"'n{v}|' || k", 8, 1_000_000) for v in range(5)
) + ")"
_OPPOSING_SQL = "GREATEST(" + ", ".join(
    _md5mod_sql(f"'o{v}|' || k", 8, 1_000_000) for v in range(5)
) + ")"
_NLI_SQL = "CAST(GREATEST(" + ", ".join(
    _md5mod_sql(f"'nli{s}|' || k", 4, 101) for s in range(3)
) + ") AS DOUBLE)"

ORACLE_SQL = {
    "validation_cascade": f"""
        WITH {_KG_TRIP_SQL},
        keyed2 AS (
          SELECT subj, obj, {_KEY_SQL} AS k FROM trip
        ),
        scored AS (
          SELECT subj, obj, k,
                 {_NORMAL_SQL} AS normal_best,
                 {_OPPOSING_SQL} AS opposing_best
          FROM keyed2
        ),
        staged AS (
          SELECT subj, obj, k, normal_best, opposing_best,
                 (CAST(normal_best AS DOUBLE)
                  / CAST(normal_best + opposing_best AS DOUBLE)) * 100.0 AS search_weight
          FROM scored
        )
        SELECT subj, obj,
               CAST(normal_best AS BIGINT) AS normal_best,
               CAST(opposing_best AS BIGINT) AS opposing_best,
               search_weight,
               CASE WHEN search_weight >= 50 THEN search_weight
                    ELSE {_NLI_SQL} END AS weight,
               CASE WHEN search_weight >= 50 THEN 'search' ELSE 'nli' END
                 AS validation_method,
               CAST(CASE WHEN normal_best > opposing_best THEN 1 ELSE 0 END AS BIGINT)
                 AS vote
        FROM staged ORDER BY subj, obj
    """,
    "j1_content_annotation_join": """
        SELECT d.doc_id, d.lang, CAST(e.label AS BIGINT) AS label,
               e.label IS NOT NULL AS has_annotation
        FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        ORDER BY d.doc_id
    """,
    "a5_entailment_max": f"""
        WITH sents AS (
          SELECT doc_id, unnest(string_split(text, '{SENT_SEP}')) AS sent
          FROM documents
        ), scored AS (
          SELECT doc_id,
                 CASE WHEN contains(sent, 'spark') THEN CAST(100 AS BIGINT)
                      ELSE CAST(concat('0x', substr(md5(sent), 1, 8)) AS BIGINT) % 100
                 END AS score
          FROM sents WHERE length(sent) >= 20
        )
        SELECT doc_id, CAST(max(score) AS BIGINT) AS entail_score,
               CAST(count(*) AS BIGINT) AS n_candidates
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "a8_fuzzy_precision_count": f"""
        WITH kws(kw) AS (VALUES {", ".join(f"('{k}')" for k in KEYWORDS)})
        SELECT d.doc_id,
               CAST(count(DISTINCT CASE WHEN contains(d.text, k.kw) THEN k.kw END)
                    AS BIGINT) AS n_matched
        FROM documents d CROSS JOIN kws k
        GROUP BY d.doc_id ORDER BY d.doc_id
    """,
    "a9_vote_majority": f"""
        WITH judges(judge) AS (VALUES {", ".join(f"({j})" for j in range(N_JUDGES))}),
        per AS (
          SELECT d.doc_id,
                 CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), ':',
                      CAST(j.judge AS VARCHAR))), 1, 8)) AS BIGINT) % 2 AS vote,
                 CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), ':',
                      CAST(j.judge AS VARCHAR), ':c')), 1, 8)) AS BIGINT) % 100 AS conf
          FROM documents d CROSS JOIN judges j
        )
        SELECT doc_id, CAST(sum(vote) AS BIGINT) AS n_yes,
               CAST(sum(conf) AS DOUBLE) / {N_JUDGES * 100} AS avg_conf,
               sum(vote) * 2 > {N_JUDGES} AS majority
        FROM per GROUP BY doc_id ORDER BY doc_id
    """,
    "o5_variant_cap": """
        WITH ranked AS (
          SELECT user_id, event_id,
                 md5('cap:' || CAST(event_id AS VARCHAR)) AS variant_key,
                 CAST(row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY md5('cap:' || CAST(event_id AS VARCHAR)), event_id)
                      AS BIGINT) AS variant_rank
          FROM events WHERE event_type = 'error'
        )
        SELECT user_id, event_id, variant_key, variant_rank
        FROM ranked WHERE variant_rank <= 3
        ORDER BY user_id, variant_rank
    """,
    "p_predicate_suite": """
        SELECT doc_id,
               regexp_replace(trim(text), '\\s+', '|', 'g') AS flat_text,
               'https://example.com' || '/doc/' || CAST(doc_id AS VARCHAR) AS abs_url
        FROM documents
        WHERE text <> '' AND NOT contains(text, ' error ') AND n_chars >= 200
        ORDER BY doc_id
    """,
    "f12_url_parse_suite": """
        WITH u AS (
          SELECT doc_id,
                 'https://' || source || '.example.com/path/' ||
                 CAST(doc_id AS VARCHAR) || '?q=1' AS url
          FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^https://([^/]+)/', 1) AS host,
               regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS query_string
        FROM u ORDER BY doc_id
    """,
    "kg_vertex_summary": f"""
        WITH {_KG_TRIP_SQL},
        vertices AS (
          SELECT src_key AS key, min(subj_type) AS type FROM keyed GROUP BY src_key
          UNION ALL
          SELECT dst_key AS key, min(obj_type) AS type FROM keyed k
          WHERE NOT EXISTS (SELECT 1 FROM keyed s WHERE s.src_key = k.dst_key)
          GROUP BY dst_key
        )
        SELECT type, CAST(count(*) AS BIGINT) AS n_vertices
        FROM vertices GROUP BY type ORDER BY type
    """,
    "kg_degree_topk": f"""
        WITH {_KG_TRIP_SQL},
        edges AS (
          SELECT DISTINCT src_key, dst_key, predicate AS relationship, weight
          FROM keyed
        )
        SELECT dst_key AS key, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY dst_key
        ORDER BY degree DESC, key LIMIT 10
    """,
    "kg_reconcile_triplets": f"""
        WITH rel_map AS (
          SELECT * FROM (VALUES
            {", ".join(f"('{s}','{c}')" for s, c in _REL_SYNONYMS)}
          ) AS t(syn, canon)
        ),
        type_map AS (
          SELECT * FROM (VALUES
            {", ".join(f"('{s}','{c}')" for s, c in _TYPE_SYNONYMS)}
          ) AS t(syn, canon)
        ),
        dirty AS (
          SELECT doc_id,
                 coalesce(ws[1], 'x') AS subj,
                 coalesce(ws[2], 'x') AS obj,
                 {_DIRTY_PREDS!r}[CAST(doc_id % 7 AS INT) + 1] AS dirty_pred,
                 {_DIRTY_STYPES!r}[CAST(doc_id % 6 AS INT) + 1] AS dirty_stype,
                 {_DIRTY_OTYPES!r}[CAST(doc_id % 5 AS INT) + 1] AS dirty_otype
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        )
        SELECT d.doc_id, d.subj,
               coalesce(ts.canon, d.dirty_stype) AS subj_type,
               coalesce(rm.canon, d.dirty_pred) AS predicate,
               coalesce(tk.canon, d.dirty_otype) AS obj_type,
               d.obj,
               CAST((CASE WHEN rm.canon IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN ts.canon IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN tk.canon IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reconciled
        FROM dirty d
        LEFT JOIN rel_map rm ON rm.syn = d.dirty_pred
        LEFT JOIN type_map ts ON ts.syn = d.dirty_stype
        LEFT JOIN type_map tk ON tk.syn = d.dirty_otype
        ORDER BY doc_id
    """,
}

QUERIES = {
    "validation_cascade": validation_cascade,
    "j1_content_annotation_join": j1_content_annotation_join,
    "a5_entailment_max": a5_entailment_max,
    "a8_fuzzy_precision_count": a8_fuzzy_precision_count,
    "a9_vote_majority": a9_vote_majority,
    "o5_variant_cap": o5_variant_cap,
    "p_predicate_suite": p_predicate_suite,
    "f12_url_parse_suite": f12_url_parse_suite,
    "kg_vertex_summary": kg_vertex_summary,
    "kg_degree_topk": kg_degree_topk,
    "kg_reconcile_triplets": kg_reconcile_triplets,
}
