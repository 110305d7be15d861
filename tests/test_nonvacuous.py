"""Every catalog query must return at least one row on the testdata.

A query whose literals drift out of the generated data's domain (the
generator DOES change between rounds — events.ts type in round 2,
c_mktsegment values in round 3) still hash-matches its oracle on the
empty result: green, but vacuous. This sweep catches that class.
"""

from __future__ import annotations

import pytest

from incubyte_vaccination_data_pipeline_spark.catalog import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_is_nonvacuous(spark, sf_dir, name):
    assert QUERIES[name](spark, sf_dir).limit(1).count() > 0, (
        f"{name} returned 0 rows — literal/domain drift against the "
        f"testdata makes its oracle check vacuous"
    )
