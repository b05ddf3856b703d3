"""Every registry query must execute under ANSI mode.

The project session factory disables ANSI (session.py) but the
grading driver's plain session inherits Spark 4's default ANSI=true —
so an ANSI-only failure (overflowing sum, strict cast, invalid array
index) passes the whole oracle suite and then dies in the driver.
This caught a real bug: the connected-components convergence probe
summed raw xxhash64 values, overflowing long under ANSI.

Execution-only (count), not oracle comparison — value correctness is
test_registry's job; this gate is about strict-mode evaluation.
"""

from __future__ import annotations

import pytest

from rdbms_scala_spark.registry import all_queries

SPECS = all_queries()


@pytest.fixture(scope="module")
def ansi_spark(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize("name", list(SPECS))
def test_query_runs_under_ansi(ansi_spark, sf_dir, name):
    assert SPECS[name].fn(ansi_spark, sf_dir).count() >= 0
