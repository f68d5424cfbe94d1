"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL over the same sf dir, compare row count, column
names, and an order-insensitive value representation. Used by
tests/test_oracle_parity.py so parity breaks fail CI before the driver sees
them."""

from __future__ import annotations

import math

import duckdb
import numpy as np
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
        # FULL float64 precision (17 significant digits round-trips
        # every double): the driver hashes raw values, so the replica
        # must distinguish everything the driver does — %.9g let two
        # last-ulp engine divergences (gini total, decay-attribution
        # credits) reach the round-13 driver undetected. `v + 0.0`
        # still normalizes -0.0. The "f:" prefix keeps float 75042.0
        # distinct from int 75042 (DuckDB HUGEINT → float64 while
        # Spark emits int64 — the round-7 class).
        return f"f:{v + 0.0:.17g}"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return f"i:{v}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _dtype_class(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "other"


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
    if res["cols_match"]:
        # dtype-CLASS parity per column (int vs float vs other): the
        # driver's value hash is dtype-sensitive, so a column that is
        # int64 under Spark and float64 under DuckDB fails there even
        # when every value agrees. Surface it here first. "other" is
        # not compared against numeric classes because object-dtype
        # columns (strings, arrays) legitimately differ in box type.
        mism = []
        for c in res["cols_spark"]:
            a, b = _dtype_class(sp[c].dtype), _dtype_class(du[c].dtype)
            if a != b and not (sp[c].isna().all() or du[c].isna().all()):
                mism.append((c, a, b))
        res["dtype_mismatches"] = mism
    if res["rows_match"] and res["cols_match"]:
        a, b = canon(sp), canon(du)
        res["values_match"] = a == b
        if not res["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            res["first_diffs"] = diffs
    else:
        res["values_match"] = False
    return res
