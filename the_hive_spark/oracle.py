"""Local mirror of the driver's DuckDB-oracle correctness harness.

Runs a registered Spark query and its oracle SQL side by side and
compares (row count, schema, order-insensitive values) the way
BASELINE.json describes: columns sorted by name, rows sorted, values
hashed. Used by tests/test_oracle_parity.py so every queries() entry is
validated *before* the driver sees it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from the_hive_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # canonical string form per cell: stable across engines iff values
    # equal; astype(object) so EMPTY frames also compare dtype-blind
    # (datetime64[ns] vs [us] on zero rows must still be equal)
    return df.map(lambda v: repr(v)).astype(object)


@dataclass
class CompareResult:
    name: str
    rows_match: bool
    schema_match: bool
    values_match: bool
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.schema_match and self.values_match


def compare(
    spark: SparkSession, name: str, fn, sql: str, sf_dir: str
) -> CompareResult:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()

    rows_match = len(spark_pdf) == len(duck_pdf)
    schema_match = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    detail = ""
    values_match = False
    if rows_match and schema_match:
        a, b = _normalize(spark_pdf), _normalize(duck_pdf)
        values_match = a.equals(b)
        if not values_match:
            neq = (a != b).any(axis=1)
            bad = a[neq].head(3).to_dict("records"), b[neq].head(3).to_dict("records")
            detail = f"first diffs: spark={bad[0]} duck={bad[1]}"
    else:
        detail = (
            f"rows spark={len(spark_pdf)} duck={len(duck_pdf)}; "
            f"cols spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    return CompareResult(name, rows_match, schema_match, values_match, detail)
