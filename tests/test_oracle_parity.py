"""Driver-mirror correctness gate: every catalog query with an oracle must
match DuckDB exactly (values compared after the catalog's own rounding).
Queries without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from tts_data_pipeline_spark.plans import catalog
from tests.conftest import SF_DIR, run_parity

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    run_parity(spark, ddb, QUERIES[name], ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
