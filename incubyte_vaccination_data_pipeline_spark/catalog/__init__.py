"""Named query catalog: the driver-facing surface of the engine.

Domains:

- ``vax``        — reference-parity patterns (country view dedup, date
  cascade, dead-letter, validity filter) over the testdata star schema.
- ``relational`` — joins / aggregations / windows / set ops / pivot /
  rollup / scalar-function breadth.
- ``dedup``      — exact + near-duplicate detection families.
- ``text``       — language id, quality scoring, tokenization,
  fingerprinting over ``documents``.
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed).
- ``events``     — event-stream analytics (JSON, windows, sessions).

Cross-engine determinism conventions (see ``vax.py`` docstring):
lowercase aliases, decimal-exact money aggregation, pinned dates,
explicit tie-breakers.
"""

from incubyte_vaccination_data_pipeline_spark.catalog.registry import (  # noqa: F401
    AS_OF,
    ORACLES,
    QUERIES,
    query,
)

# each import registers its domain's queries
from incubyte_vaccination_data_pipeline_spark.catalog import vax  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import relational  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import relational_ext  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import tpch_gap  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import events  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import dedup  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import text  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import similarity  # noqa: F401,E402
from incubyte_vaccination_data_pipeline_spark.catalog import multimodal  # noqa: F401,E402

FLAGSHIP_COUNTRY = vax.FLAGSHIP_COUNTRY


def queries():
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
