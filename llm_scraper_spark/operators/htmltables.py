"""F19: HTML ``<table>`` → text (SURVEY.md §2.8).

Reference analog: scrape_eccomerce.py:126-142 — after a spec-button
click the page's ``<table>`` elements are parsed with ``pd.read_html``
and folded into the page text dict as a row-wise string.  Here the
parse is pure JVM regexp work (``regexp_extract_all`` row split +
cell split, whole-stage codegen), no Python and no HTML library in
the hot path: product-page tables are shallow machine-generated
markup, and the two-level non-greedy extract handles exactly the
``<tr>``/``<td>``/``<th>`` structure ``pd.read_html`` consumes in the
reference.  A real-world fallback for pathological markup would be a
mapInPandas kernel with an HTML parser — same output contract.

The driver-gate query synthesizes the table column deterministically
from ``documents.text`` (same CTE in the DuckDB twin, like the dedup
suite's augmented corpus); the synthetic web also emits real ``table``
spans (sources/synthweb.py) which tests/test_html_tables.py parses
with the same column function against a pure-Python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: matches what pd.read_html consumes in the reference: row split on
#: <tr>…</tr> (non-greedy), cells on <td>/<th> with text-only content
_ROW_RE = r"<tr>(.*?)</tr>"
_CELL_RE = r"<t[dh]>([^<]*)</t[dh]>"
_CELL_SEP = " | "


def table_rows_text(html_col) -> "F.Column":
    """``array<struct<row_idx int, row_text string, n_cells int>>`` for
    an HTML-table string column — each table row as its cells joined
    with ``" | "`` (the reference's ``combined.to_string`` row form)."""
    rows = F.regexp_extract_all(html_col, F.lit(_ROW_RE), 1)
    return F.transform(
        rows,
        lambda row_html, i: F.struct(
            i.alias("row_idx"),
            F.array_join(
                F.regexp_extract_all(row_html, F.lit(_CELL_RE), 1), _CELL_SEP
            ).alias("row_text"),
            F.size(F.regexp_extract_all(row_html, F.lit(_CELL_RE), 1)).alias(
                "n_cells"
            ),
        ),
    )


def parse_table_html(html: str) -> list[tuple[int, str, int]]:
    """Pure-Python oracle for ``table_rows_text`` (shared with tests)."""
    import re

    out = []
    for i, row in enumerate(re.findall(_ROW_RE, html or "")):
        cells = re.findall(_CELL_RE, row)
        out.append((i, _CELL_SEP.join(cells), len(cells)))
    return out


def f19_html_table_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: synthesize a 3-row HTML table per document
    (header row + two data rows from the first four words), parse it
    back to row-wise text with ``table_rows_text``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), " ")
    cell = lambda i: F.coalesce(F.try_element_at(w, F.lit(i)), F.lit("na"))  # noqa: E731
    html = F.concat(
        F.lit("<table><tr><th>key</th><th>value</th></tr><tr><td>"),
        cell(1),
        F.lit("</td><td>"),
        cell(2),
        F.lit("</td></tr><tr><td>"),
        cell(3),
        F.lit("</td><td>"),
        cell(4),
        F.lit("</td></tr></table>"),
    )
    return (
        docs.select("doc_id", F.explode(table_rows_text(html)).alias("r"))
        .select(
            "doc_id",
            F.col("r.row_idx").cast("long").alias("row_idx"),
            F.col("r.row_text").alias("row_text"),
            F.col("r.n_cells").cast("long").alias("n_cells"),
        )
        .orderBy("doc_id", "row_idx")
    )


ORACLE_SQL = {
    "f19_html_table_text": r"""
        WITH h AS (
          SELECT doc_id,
                 '<table><tr><th>key</th><th>value</th></tr><tr><td>' ||
                 coalesce(ws[1], 'na') || '</td><td>' || coalesce(ws[2], 'na') ||
                 '</td></tr><tr><td>' ||
                 coalesce(ws[3], 'na') || '</td><td>' || coalesce(ws[4], 'na') ||
                 '</td></tr></table>' AS html
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ),
        rows_ AS (
          SELECT doc_id, regexp_extract_all(html, '<tr>(.*?)</tr>', 1) AS rr
          FROM h
        ),
        ex AS (
          SELECT doc_id,
                 unnest(rr) AS row_html,
                 unnest(range(0, len(rr))) AS row_idx
          FROM rows_
        )
        SELECT doc_id,
               CAST(row_idx AS BIGINT) AS row_idx,
               array_to_string(
                 regexp_extract_all(row_html, '<t[dh]>([^<]*)</t[dh]>', 1), ' | '
               ) AS row_text,
               CAST(len(regexp_extract_all(row_html, '<t[dh]>([^<]*)</t[dh]>', 1))
                    AS BIGINT) AS n_cells
        FROM ex ORDER BY doc_id, row_idx
    """,
}

QUERIES = {
    "f19_html_table_text": f19_html_table_text,
}
