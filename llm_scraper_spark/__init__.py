"""llm_scraper_spark — a brand-new PySpark-native crawl-frontier + analytics
engine with the data-processing capabilities of DAMSlabUMBC/llm-scraper.

Built Spark-first (DataFrame/SQL + vectorized pandas/Arrow UDFs), NOT a
port of the reference's per-URL Python loop.  See SURVEY.md for the
structural mapping (operator inventory §2) and BASELINE.md for the
performance target.

Subpackages
-----------
- ``functions``  scalar/vectorized functions (URL canonicalization,
                 text normalization, hashing, fingerprinting)
- ``sources``    deterministic synthetic web + table readers
- ``operators``  crawl round, frontier/seen state, span folds, dedup,
                 similarity search, KG build, validation aggregates
- ``plans``      driver-side round loop, checkpointing, lineage
- ``streaming``  Structured Streaming analogs (stateful URL dedup)
"""

__version__ = "0.1.0"
