"""S6 raw-HTML dump: the JVM span→HTML render ≡ a pure-Python
renderer over real synthweb span sequences, and the Crawler dump view
round-trips every span of every fetched page in document order."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_scraper_spark.operators.htmldump import raw_html_col, raw_html_view
from llm_scraper_spark.sources.synthweb import page_spans, seed_urls

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def _render_py(spans: list[dict]) -> str:
    parts = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        k, t, m = s["kind"], s["text"] or "", s["media_ref"] or ""
        if k == "heading":
            parts.append(f"<h1>{t}</h1>")
        elif k == "text":
            parts.append(f"<p>{t}</p>")
        elif k == "code":
            parts.append(f"<pre>{t}</pre>")
        elif k == "image":
            parts.append(f'<img src="{m}"/>')
        elif k == "video":
            parts.append(f'<video src="{m}">{t}</video>')
        elif k == "table":
            parts.append(t)
    return "<html><body>" + "".join(parts) + "</body></html>"


def _pages():
    urls = list(
        dict.fromkeys(u.split("#")[0].split("?")[0].lower() for u in seed_urls(80))
    )
    return [(u, page_spans(u)) for u in urls]


def test_jvm_render_matches_python_oracle(spark):
    pages = _pages()
    df = spark.createDataFrame(pages, SPAN_SCHEMA)
    got = {
        r["doc_id"]: r["raw"]
        for r in df.select("doc_id", raw_html_col(F.col("spans")).alias("raw")).collect()
    }
    for url, spans in pages:
        assert got[url] == _render_py(spans), url


def test_dump_view_covers_all_kinds(spark):
    pages = _pages()
    df = spark.createDataFrame(pages, SPAN_SCHEMA).withColumn("round", F.lit(0))
    view = raw_html_view(df)
    assert view.columns == ["doc_id", "round", "raw_html", "n_bytes"]
    rows = view.collect()
    assert len(rows) == len(pages)
    assert all(r["n_bytes"] == len(r["raw_html"]) for r in rows)
    blob = "".join(r["raw_html"] for r in rows)
    # every span kind the synthetic web emits survives the render
    for tag in ("<h1>", "<p>", "<pre>", "<img src=", "<video src=", "<table>"):
        assert tag in blob, tag
