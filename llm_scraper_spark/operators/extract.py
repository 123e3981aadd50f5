"""Deterministic entity/triplet extraction over span documents.

The reference's LLM stages (entity_analysis.py:21-85 entities,
relationship_analysis.py:24-86 triplets, iot_classification.py:14-81
classify gate) become *deterministic rule-based extractors* exposed as
vectorized pandas UDFs (SURVEY.md §2.10) so outputs are exactly
reproducible — but the surrounding string plumbing is the reference's,
bug-for-bug:

  synthetic "LLM response" with <think>/```json wrappers
    → remove_think_tags/extract_json/extract_python chain
       (response_cleaner.py:3-35)
    → TRIPLET_PATTERN regex parse (relationship_analysis.py:18-22,66-71)
    → parse_string_to_list camel-collapse mangle
       (response_cleaner.py:48-63: 'smart hub' → 'SmartHub')

Pipeline order preserves the reference's cheap-gate-before-expensive
optimization (scrape_eccomerce.py:201-206): the IoT classify filter
runs before entity/triplet extraction.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import (
    extract_json,
    extract_python,
    parse_string_to_list,
    parse_triplets,
    remove_think_tags,
)

# word → entity type (the reference's types are open-ended per prompt;
# we fix a deterministic vocabulary over the synthetic web's words)
ENTITY_TYPES = {
    "sensor": "sensor",
    "camera": "device",
    "thermostat": "device",
    "lock": "device",
    "plug": "device",
    "bulb": "device",
    "hub": "device",
    "gateway": "device",
    "router": "device",
    "vendor": "manufacturer",
    "manufacturer": "manufacturer",
    "temperature": "observation",
    "motion": "observation",
    "humidity": "observation",
    "energy": "observation",
    "location": "observation",
    "audio": "observation",
    "video": "observation",
    "firmware": "process",
    "cloud": "application",
    "encryption": "process",
    "policy": "privacyPolicy",
    "consent": "regulation",
}

PREDICATES = ["manufactures", "observes", "collects", "contains", "supports"]
IOT_WORDS = frozenset(ENTITY_TYPES)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:4], "big")


def classify_iot(spans: list[dict]) -> bool:
    """P6 gate (iot_classification.py:77-80 suffix-classify analog):
    a doc 'is IoT' iff any text-bearing span mentions an IoT word."""
    for s in spans:
        if s.get("text"):
            if any(w in IOT_WORDS for w in s["text"].split()):
                return True
    return False


def extract_entities(spans: list[dict]) -> list[tuple[str, str]]:
    """Per-modality entity extraction + cross-modality set union
    (scrape_eccomerce.py:238-244) — returned sorted for determinism.
    Every other entity becomes multi-word ('smart X') to exercise the
    camel-collapse mangle downstream."""
    ents: set[tuple[str, str]] = set()
    for s in spans:
        if not s.get("text"):
            continue
        for w in s["text"].split():
            et = ENTITY_TYPES.get(w)
            if et is None:
                continue
            name = f"smart {w}" if _h(w) % 2 == 0 else w
            ents.add((et, name))
    return sorted(ents)


def synth_llm_response(entities: list[tuple[str, str]]) -> str:
    """Deterministic stand-in for the deepseek response: triples over
    consecutive entity pairs, wrapped in the tags the reference strips."""
    triples = []
    for (t1, n1), (t2, n2) in zip(entities, entities[1:]):
        pred = PREDICATES[_h(n1 + "|" + n2) % len(PREDICATES)]
        triples.append(f"(('{t1}', '{n1}'), '{pred}', ('{t2}', '{n2}'))")
    body = "[" + ", ".join(triples) + "]"
    return f"<think>deterministic extraction</think>```json\n{body}\n```"


def extract_triplets_doc(spans: list[dict]) -> list[tuple[str, str, str, str, str]]:
    """Full reference string pipeline for one doc (pure; shared with
    the test oracle)."""
    if not classify_iot(spans):
        return []
    ents = extract_entities(spans)
    if len(ents) < 2:
        return []
    raw = synth_llm_response(ents)
    cleaned = extract_python(extract_json(remove_think_tags(raw)))
    # pp-path mangle: camel-collapse multi-word names, compact repr
    mangled = parse_string_to_list(cleaned)
    if mangled is None:
        return []
    out = []
    for item in mangled:
        out.extend(parse_triplets(item))
    return out


_TRIPLET_ROWS = T.ArrayType(
    T.StructType(
        [
            T.StructField("subj_type", T.StringType()),
            T.StructField("subj", T.StringType()),
            T.StructField("predicate", T.StringType()),
            T.StructField("obj_type", T.StringType()),
            T.StructField("obj", T.StringType()),
        ]
    )
)


@F.pandas_udf(T.BooleanType())
def classify_iot_udf(spans: pd.Series) -> pd.Series:
    return spans.map(
        lambda arr: classify_iot([dict(s) for s in arr]) if arr is not None else False
    )


@F.pandas_udf(_TRIPLET_ROWS)
def extract_triplets_udf(spans: pd.Series) -> pd.Series:
    def one(arr):
        if arr is None:
            return []
        return [
            {
                "subj_type": st,
                "subj": sn,
                "predicate": p,
                "obj_type": ot,
                "obj": on,
            }
            for st, sn, p, ot, on in extract_triplets_doc([dict(s) for s in arr])
        ]

    return spans.map(one)


def extract_triplets(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → triplets rows.  The classify gate is
    a cheap filter stage BEFORE the extraction UDF (the reference's
    gate-before-LLM ordering, kept explicit for Catalyst)."""
    gated = documents.filter(classify_iot_udf("spans"))
    return gated.select(
        F.col("doc_id").alias("url"), F.explode(extract_triplets_udf("spans")).alias("t")
    ).select("url", "t.subj_type", "t.subj", "t.predicate", "t.obj_type", "t.obj")
