"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, normalizes values,
and asserts row-count + column-name + order-insensitive value equality.
Catching a mismatch here is much cheaper than waiting for the driver's
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        # the driver compares through pandas, where DATE and midnight
        # TIMESTAMP both become datetime64 — normalize identically
        return _dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    out = []
    for row in rows:
        out.append(tuple(_norm(row[i]) for i in order))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def compare(spark_df, sql: str, sf_dir: str) -> None:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns

    con = duck_connection(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _canon([tuple(r) for r in spark_rows], spark_cols)
    d = _canon(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, duck): {diffs}")
