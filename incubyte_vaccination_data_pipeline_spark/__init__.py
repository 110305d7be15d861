"""PySpark-native analytics/ETL engine with the capabilities of the
reference vaccination-data pipeline, re-expressed Spark-first.

The engine is organized as:

- ``session``   — SparkSession factory (AQE, UTC, Arrow on).
- ``schema``    — canonical schema + the three column-mapping layers
  (source dialect -> canonical -> warehouse), mirroring
  ``src/utils/constants.py`` of the reference.
- ``functions`` — scalar expression builders (multi-format date
  cascade, AGE / staleness derivations) as native Column expressions.
- ``sources``   — CSV dialect ingest (pipe-header strip, synonym
  projection, country synthesis) and parquet warehouse/dead-letter IO.
- ``operators`` — validation split, country views (dedup-latest),
  relational breadth (joins/aggs/windows), dedup family (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text analysis, multimodal plumbing.
- ``streaming`` — Structured Streaming ingest of the events table.
- ``plans``     — plan-inspection helpers (pushdown/broadcast asserts).

Everything is lazy DataFrame/SQL; no ``collect()`` in the data path;
Python UDFs only where native expressions cannot express the
semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"
