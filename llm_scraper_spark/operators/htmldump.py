"""S6: raw-HTML page dump (SURVEY.md §2.1).

Reference analog: extract_htmls.py:43-87 — ``driver.page_source`` is
written verbatim to ``{GROUP}{n}.html``, one file per fetched page, as
a debugging/reprocessing affordance alongside the parsed output.

The Spark-first analog inverts the storage: the crawl snapshot already
persists the *parsed* interleaved span sequence (the system of record;
``plans/crawler.py`` fetched snapshot), and the raw HTML source is a
**derived projection** — ``raw_html_col`` deterministically re-renders
each page's markup from its ordered spans, entirely in JVM builtins
(``transform`` + ``array_join`` + ``concat``, whole-stage codegen).
That keeps the hot fetch path free of a second large string column per
page while still giving users the reference's "give me the raw HTML of
page X" affordance: ``Crawler.raw_html_df()`` is the dump table, and
``dump_raw_html`` writes it as parquet partitioned by round (the
file-per-page analog; at 10^10 pages a parquet sink is the only shape
that survives — a million tiny .html files per round would melt any
filesystem's metadata layer).

Render contract (one tag per span kind, document order):
heading → ``<h1>t</h1>``; text → ``<p>t</p>``; code → ``<pre>t</pre>``;
image → ``<img src="m"/>``; video → ``<video src="m">t</video>``
(transcript as body text, media_downloader.py:44-46); table → the
span text verbatim (it is already ``<table>`` markup, F19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _render_one(s) -> "F.Column":
    t = F.coalesce(s["text"], F.lit(""))
    m = F.coalesce(s["media_ref"], F.lit(""))
    return (
        F.when(s["kind"] == "heading", F.concat(F.lit("<h1>"), t, F.lit("</h1>")))
        .when(s["kind"] == "text", F.concat(F.lit("<p>"), t, F.lit("</p>")))
        .when(s["kind"] == "code", F.concat(F.lit("<pre>"), t, F.lit("</pre>")))
        .when(s["kind"] == "image", F.concat(F.lit('<img src="'), m, F.lit('"/>')))
        .when(
            s["kind"] == "video",
            F.concat(F.lit('<video src="'), m, F.lit('">'), t, F.lit("</video>")),
        )
        .when(s["kind"] == "table", t)
        .otherwise(F.lit(""))
    )


def raw_html_col(spans_col) -> "F.Column":
    """Raw page source re-rendered from an ordered
    ``array<struct<kind,text,media_ref,…>>`` span column — pure JVM."""
    return F.concat(
        F.lit("<html><body>"),
        F.array_join(F.transform(spans_col, _render_one), ""),
        F.lit("</body></html>"),
    )


def raw_html_view(documents: DataFrame) -> DataFrame:
    """The S6 dump table: (doc_id, round, raw_html, n_bytes) derived
    from a documents snapshot carrying ``spans``."""
    return documents.select(
        "doc_id",
        "round",
        raw_html_col(F.col("spans")).alias("raw_html"),
    ).withColumn("n_bytes", F.length("raw_html").cast("long"))


def dump_raw_html(documents: DataFrame, path: str) -> None:
    """Write the dump partitioned by crawl round — the per-page .html
    file analog, parquet-shaped for scale."""
    raw_html_view(documents).write.mode("overwrite").partitionBy("round").parquet(path)


# --------------------------------------------------- driver-gate query
def s6_raw_html_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the render: build a deterministic span sequence
    per document (same construction in the DuckDB twin), apply the
    production ``raw_html_col``, and emit the rendered source.  The
    crawl-side render over real synthweb spans is gated by
    tests/test_html_dump.py against a pure-Python renderer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), " ")
    did = F.col("doc_id")
    span = lambda kind, text, media: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"), text.alias("text"), media.alias("media_ref")
    )
    nulls = F.lit(None).cast("string")
    spans = F.filter(
        F.array(
            span("heading", F.upper(F.coalesce(F.try_element_at(w, F.lit(1)), F.lit("x"))), nulls),
            span("text", F.concat_ws(" ", F.slice(w, 3, 6)), nulls),
            F.when(
                did % 3 == 0,
                span(
                    "image",
                    nulls,
                    F.concat(F.lit("http://media/"), did.cast("string"), F.lit("/a.jpg")),
                ),
            ).otherwise(span(None, nulls, nulls)),
            F.when(
                did % 5 == 0,
                span(
                    "code",
                    F.concat(F.lit("cfg = "), F.coalesce(F.try_element_at(w, F.lit(2)), F.lit("x"))),
                    nulls,
                ),
            ).otherwise(span(None, nulls, nulls)),
            F.when(
                did % 4 == 0,
                span(
                    "video",
                    F.concat_ws(" ", F.slice(w, 2, 3)),
                    F.concat(F.lit("http://media/"), did.cast("string"), F.lit("/v.mp4")),
                ),
            ).otherwise(span(None, nulls, nulls)),
        ),
        lambda s: s["kind"].isNotNull(),
    )
    return (
        docs.select("doc_id", raw_html_col(spans).alias("raw_html"))
        .withColumn("n_bytes", F.length("raw_html").cast("long"))
        .orderBy("doc_id")
    )


ORACLE_SQL = {
    "s6_raw_html_dump": """
        WITH ws_t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        rendered AS (
          SELECT doc_id,
                 '<html><body>'
                 || '<h1>' || upper(coalesce(ws[1], 'x')) || '</h1>'
                 || '<p>' || array_to_string(ws[3:8], ' ') || '</p>'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '<img src="http://media/' || doc_id || '/a.jpg"/>'
                         ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                         THEN '<pre>cfg = ' || coalesce(ws[2], 'x') || '</pre>'
                         ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                         THEN '<video src="http://media/' || doc_id || '/v.mp4">'
                              || array_to_string(ws[2:4], ' ') || '</video>'
                         ELSE '' END
                 || '</body></html>' AS raw_html
          FROM ws_t
        )
        SELECT doc_id, raw_html,
               CAST(length(raw_html) AS BIGINT) AS n_bytes
        FROM rendered ORDER BY doc_id
    """,
}

QUERIES = {"s6_raw_html_dump": s6_raw_html_dump}
