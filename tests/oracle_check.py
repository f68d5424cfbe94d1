"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL over the same sf dir, compare row count, column
names, and an order-insensitive value representation. Used by
tests/test_oracle_parity.py so parity breaks fail CI before the driver sees
them."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flink_rag_spark.sources.tables import TABLE_NAMES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # normalize -0.0 and float noise at a precision far below the
        # catalog's own ROUND()ing, far above double noise
        return f"{v + 0.0:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    sp = spark_df.toPandas()
    du = duck_run(oracle_sql, sf_dir)
    res = {
        "rows_spark": len(sp), "rows_duck": len(du),
        "cols_spark": sorted(sp.columns), "cols_duck": sorted(du.columns),
    }
    res["rows_match"] = res["rows_spark"] == res["rows_duck"]
    res["cols_match"] = res["cols_spark"] == res["cols_duck"]
    if res["rows_match"] and res["cols_match"]:
        a, b = canon(sp), canon(du)
        res["values_match"] = a == b
        if not res["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            res["first_diffs"] = diffs
    else:
        res["values_match"] = False
    return res
