"""F19 HTML-table→text: synthetic-web table spans parsed by the JVM
regexp column function ≡ the pure-Python oracle parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_scraper_spark.operators.htmltables import (
    parse_table_html,
    table_rows_text,
)
from llm_scraper_spark.sources.synthweb import page_spans, seed_urls


def _canon(urls):
    return list(dict.fromkeys(u.split("#")[0].split("?")[0].lower() for u in urls))


def _table_spans():
    out = []
    for u in _canon(seed_urls(120)):
        for s in page_spans(u):
            if s["kind"] == "table":
                out.append((u, s["text"]))
    return out


def test_synthweb_emits_table_spans():
    tables = _table_spans()
    assert tables, "a quarter of synthetic pages must carry a table span"
    for _, html in tables:
        assert html.startswith("<table><tr><td>") and html.endswith("</tr></table>")


def test_jvm_table_parse_matches_python_oracle(spark):
    tables = _table_spans()
    df = spark.createDataFrame(tables, "url string, html string")
    got = [
        (r["url"], r["r"]["row_idx"], r["r"]["row_text"], r["r"]["n_cells"])
        for r in df.select("url", F.explode(table_rows_text(F.col("html"))).alias("r"))
        .orderBy("url", "r.row_idx")
        .collect()
    ]
    want = []
    for url, html in sorted(set(tables)):
        for idx, text, n in parse_table_html(html):
            want.append((url, idx, text, n))
    assert got == want
    # every synthetic table row has exactly 2 cells (key/value spec rows)
    assert all(n == 2 for _, _, _, n in got)
