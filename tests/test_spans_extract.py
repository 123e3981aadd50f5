"""Span-fold, fuzzy-dedup, extraction, KG-build tests — reference
semantics reproduced bug-for-bug, Spark pipeline vs sequential oracle."""

import pytest

from llm_scraper_spark.functions.text import (
    deduplicate_fields,
    indel_ratio,
    node_key,
    parse_string_to_list,
)
from llm_scraper_spark.operators.extract import (
    extract_triplets,
    extract_triplets_doc,
)
from llm_scraper_spark.operators.graph import build_kg, degree_topk
from llm_scraper_spark.operators.spans import dedup_spans, fold_spans, heading_fold
from llm_scraper_spark.operators.validate import (
    nli_score,
    search_counts,
    validate_triplets,
)
from llm_scraper_spark.schemas import DOCUMENTS
from llm_scraper_spark.sources.synthweb import page_spans, seed_urls


def _span(kind, text, off, ref=None):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


# ---------------------------------------------------------------- fold W1
def test_fold_reference_semantics():
    spans = [
        _span("heading", "Privacy", 0),
        _span("heading", "Data", 1),
        _span("text", "we collect things", 2),
        _span("text", " and more ", 3),
        _span("heading", "Security", 4),
        _span("text", "is ignored (drop-last bug)", 5),
    ]
    out = fold_spans(spans)
    # prev starts as heading → first key begins with " -> "; heading→text
    # appends with NO separator; text→text strips+spaces; last pair dropped
    assert out == [(" -> Privacy -> Data", "we collect things and more")]


def test_fold_skips_media_spans():
    spans = [
        _span("heading", "A", 0),
        _span("image", None, 1, "http://x/i.jpg"),
        _span("text", "t1", 2),
        _span("heading", "B", 3),
    ]
    assert fold_spans(spans) == [(" -> A", "t1")]


# ------------------------------------------------------------ fuzzy dedup
def test_indel_ratio_matches_rapidfuzz_definition():
    assert indel_ratio("abc", "abc") == 100.0
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("abc", "") == 0.0
    # LCS("abcd","abxd") = 3 → 2*3/8*100 = 75
    assert indel_ratio("abcd", "abxd") == 75.0


def test_deduplicate_fields_first_wins():
    items = [
        ("title", "Smart Hub 2000"),
        ("name", "smart hub 2000"),        # ≥90 vs title → dropped
        ("desc", "a totally different product description"),
    ]
    assert deduplicate_fields(items) == [items[0], items[2]]


# --------------------------------------------------------------- mangling
def test_parse_string_to_list_camel_collapse():
    s = "[(('device', 'Govee Smart Light Bulbs'), 'observes', ('observation', 'motion'))]"
    out = parse_string_to_list(s)
    assert out == ["(('device','GoveeSmartLightBulbs'),'observes',('observation','motion'))"]


def test_node_key():
    assert node_key("Smart Hub 2.0") == "SmartHub2_0"


# ------------------------------------------------- end-to-end vs oracle
@pytest.fixture(scope="module")
def docs_df(spark):
    urls = [u.split("#")[0].split("?")[0].lower() for u in seed_urls(60)]
    rows = [(u, page_spans(u)) for u in dict.fromkeys(urls)]
    return spark.createDataFrame(rows, DOCUMENTS), dict(rows)


def test_extract_pipeline_matches_sequential_oracle(spark, docs_df):
    df, oracle_docs = docs_df
    got = {
        (r["url"], r["subj_type"], r["subj"], r["predicate"], r["obj_type"], r["obj"])
        for r in extract_triplets(df).collect()
    }
    want = set()
    for url, spans in oracle_docs.items():
        for st, sn, p, ot, on in extract_triplets_doc(spans):
            want.add((url, st, sn, p, ot, on))
    assert got == want
    assert want, "oracle must produce triplets on the synthetic corpus"
    # camel-collapse mangle visible in output (multi-word → CamelCase)
    assert any("Smart" in t[2] for t in want)


def test_validation_cascade(spark, docs_df):
    df, _ = docs_df
    t = validate_triplets(extract_triplets(df))
    rows = t.collect()
    assert rows
    for r in rows:
        n, o = search_counts(
            "|".join([r["subj_type"], r["subj"], r["predicate"], r["obj_type"], r["obj"]])
        )
        assert r["normal_best"] == n and r["opposing_best"] == o
        w1 = n / (n + o) * 100.0
        if w1 >= 50:
            assert r["validation_method"] == "search" and r["weight"] == w1
        else:
            assert r["validation_method"] == "nli"
            assert r["weight"] == nli_score(
                "|".join(
                    [r["subj_type"], r["subj"], r["predicate"], r["obj_type"], r["obj"]]
                )
            )
        assert r["vote"] == (1 if n > o else 0)


def test_kg_build_and_degree(spark, docs_df):
    df, _ = docs_df
    vertices, edges = build_kg(extract_triplets(df))
    v = vertices.collect()
    e = edges.collect()
    assert v and e
    keys = {r["key"] for r in v}
    assert len(keys) == len(v), "vertex keys unique (insert-if-absent)"
    assert all(" " not in r["key"] for r in v)
    assert all(r["src_key"] in keys and r["dst_key"] in keys for r in e)
    top = degree_topk(edges, k=5).collect()
    assert top == sorted(top, key=lambda r: (-r["degree"], r["key"]))


def test_dedup_spans_row_local(spark):
    spans = [
        _span("text", "identical text here", 0),
        _span("text", "identical text here!", 1),   # ≥90 → dropped
        _span("image", None, 2, "http://x/i.jpg"),  # media kept
        _span("text", "completely other words entirely", 3),
    ]
    df = spark.createDataFrame([("d1", spans)], DOCUMENTS)
    out = dedup_spans(df).collect()[0]["spans"]
    assert [s["offset"] for s in out] == [0, 2, 3]


def test_heading_fold_dataframe(spark, docs_df):
    df, oracle_docs = docs_df
    got = {
        (r["doc_id"], r["heading_path"], r["content"])
        for r in heading_fold(df).collect()
    }
    want = set()
    for url, spans in oracle_docs.items():
        for k, v in fold_spans(spans):
            want.add((url, k, v))
    assert got == want
