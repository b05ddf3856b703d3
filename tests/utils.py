"""Oracle-comparison helper mirroring the driver's check: row count,
column names, and an order-insensitive value comparison with columns
sorted by name."""

from __future__ import annotations

import datetime
import math

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # Queries already round explicitly; this guards residual ulp noise.
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # repr-compare (not ==) so int 1 vs float 1.0 — a dtype mismatch the
    # driver's value hash would catch — fails here too.
    rows = [
        repr(tuple(_norm_cell(v) for v in row))
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_matches_oracle(spark_df, oracle_con, sql: str, name: str = "query"):
    got = spark_df.toPandas()
    exp = oracle_con.sql(sql).df()
    assert len(got) == len(exp), f"{name}: row count {len(got)} != oracle {len(exp)}"
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns)), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(exp.columns)}"
    )
    got.columns = [c.lower() for c in got.columns]
    exp.columns = [c.lower() for c in exp.columns]
    g, e = _normalize(got), _normalize(exp)
    for i, (a, b) in enumerate(zip(g, e)):
        assert a == b, f"{name}: first mismatched row {i}:\n  spark:  {a}\n  oracle: {b}"
    assert g == e, f"{name}: value mismatch"
