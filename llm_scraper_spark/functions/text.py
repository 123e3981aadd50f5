"""Text scalar functions — reference-parity versions (bug-for-bug).

Reference sources (file:line in /root/reference/server/scripts):
- normalize:            util/scraper/content_cleaner.py:5-6
- fuzzy ratio:          rapidfuzz fuzz.ratio as used at
                        util/scraper/content_cleaner.py:16-18 (Indel
                        similarity = 2·LCS/(|a|+|b|)·100; reimplemented
                        here since rapidfuzz isn't in this container —
                        mathematically identical)
- deduplicate fields:   content_cleaner.py:8-24 (first-wins, ≥90)
- remove_think_tags:    util/llm_utils/response_cleaner.py:3-17
                        (including its pick-shorter-of-two-regexes rule)
- extract_json/python:  response_cleaner.py:19-35
- parse_string_to_list: response_cleaner.py:37-67 — the camel-collapse
                        mangle ('Govee Smart Light Bulbs' →
                        'GoveeSmartLightBulbs') then str(tuple) with
                        spaces removed.  Reproduced exactly because the
                        mangled names are part of the golden outputs.
                        (We use ast.literal_eval where the reference
                        uses eval — identical results on literal input,
                        and never executes code.)
- triplet regex:        analysis/relationship_analysis.py:18-22,66-71

All are exposed as vectorized pandas UDF wrappers; the pure functions
are shared with the test oracles.
"""

from __future__ import annotations

import ast
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def indel_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio`` (Indel similarity ×100): 2·LCS/(|a|+|b|)·100."""
    if not a and not b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    # O(la·lb) LCS with numpy rows (strings here are short page fields)
    prev = np.zeros(lb + 1, dtype=np.int32)
    for ca in a:
        cur = np.zeros(lb + 1, dtype=np.int32)
        for j, cb in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1])
        prev = cur
    lcs = int(prev[lb])
    return 200.0 * lcs / (la + lb)


def deduplicate_fields(
    items: list[tuple[str, str]], threshold: float = 90.0
) -> list[tuple[str, str]]:
    """First-wins fuzzy field dedup (content_cleaner.py:8-24): a later
    field is dropped if its normalized text is ≥threshold similar to
    ANY earlier kept field.  Order-dependent by design."""
    kept: list[tuple[str, str]] = []
    for tag, text in items:
        norm = normalize(text)
        if any(indel_ratio(norm, normalize(old)) >= threshold for _, old in kept):
            continue
        kept.append((tag, text))
    return kept


def remove_think_tags(text: str) -> str:
    c1 = re.sub(r"<think>.*?</think>", "", text, flags=re.DOTALL).strip()
    c2 = re.sub(r"^.*?</think>", "", text, flags=re.DOTALL).strip()
    return c1 if len(c1) < len(c2) else c2


def extract_json(text: str) -> str:
    return re.sub(r"^```json\n?|```$", "", text, flags=re.MULTILINE).strip()


def extract_python(text: str) -> str:
    return re.sub(r"^```python\n?|```$", "", text, flags=re.MULTILINE).strip()


_CAMEL = re.compile(r"'([a-zA-Z]+(?:\s+[a-zA-Z]+)+)'")


def parse_string_to_list(input_string: str) -> list[str] | None:
    input_string = input_string.strip()
    input_string = _CAMEL.sub(
        lambda m: "'"
        + "".join(w.capitalize() for w in m.group(1).split())
        + "'",
        input_string,
    )
    try:
        parsed_list = ast.literal_eval(input_string)
    except (SyntaxError, ValueError):
        return None
    return [str(item).replace(" ", "") for item in parsed_list]


TRIPLET_PATTERN = re.compile(
    r"""
\(\(\s*['"`]([^'"`]+)['"`]\s*,\s*['"`]([^'"`]+)['"`]\s*\)\s*,      # Subject
\s*['"`]([^'"`]+)['"`]\s*,                                      # Predicate
\s*\(\s*['"`]([^'"`]+)['"`]\s*,\s*['"`]([^'"`]+)['"`]\s*\)\)       # Object
""",
    re.VERBOSE,
)


def parse_triplets(text: str) -> list[tuple[str, str, str, str, str]]:
    """Regex triplet parse (relationship_analysis.py:66-71)."""
    return TRIPLET_PATTERN.findall(text)


def node_key(name: str) -> str:
    """Graph node key: strip ALL whitespace then replace forbidden
    chars with '_' (db.py:46-50,66)."""
    return re.sub(r"[^a-zA-Z0-9_-]", "_", "".join(name.split()))


# ---- pandas UDF wrappers ------------------------------------------------

@F.pandas_udf(T.StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize(x) if x is not None else None)


@F.pandas_udf(T.StringType())
def node_key_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: node_key(x) if x is not None else None)


@F.pandas_udf(T.DoubleType())
def indel_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            indel_ratio(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ]
    )


@F.pandas_udf(T.StringType())
def clean_llm_response_udf(s: pd.Series) -> pd.Series:
    """remove_think_tags → extract_json → extract_python chain
    (relationship_analysis.py:60-62)."""
    return s.map(
        lambda x: extract_python(extract_json(remove_think_tags(x)))
        if x is not None
        else None
    )
