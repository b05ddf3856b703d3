"""Every registered query runs and, when it declares an oracle,
matches DuckDB on the same tables — the local mirror of the driver's
t2 correctness gate."""

from __future__ import annotations

import pytest

from rdbms_scala_spark.registry import all_queries
from tests.utils import assert_matches_oracle

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # Weaker rows-only check, like the driver's — but non-empty:
        # every rows-only query must produce output on the testdata.
        assert df.count() > 0
        assert len(df.schema.fields) > 0
    else:
        assert_matches_oracle(df, oracle, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
