"""Column profiling (operators/profiling.py): null/distinct/extreme
semantics, the approx scale path's plan shape, and accuracy."""

import pyspark.sql.functions as F

from flink_rag_spark.operators.profiling import profile_columns


def _frame(spark):
    rows = [(1, "a", 10.5), (2, "b", None), (3, None, 10.5),
            (4, "a", 2.0), (None, "c", None)]
    return spark.createDataFrame(rows, "k long, s string, v double")


def test_profile_counts_nulls_distincts_extremes(spark):
    out = {r["col_name"]: r for r in
           profile_columns(_frame(spark)).collect()}
    assert set(out) == {"k", "s", "v"}
    k, s, v = out["k"], out["s"], out["v"]
    assert all(r["n_rows"] == 5 for r in out.values())
    assert (k["n_nulls"], s["n_nulls"], v["n_nulls"]) == (1, 1, 2)
    assert (k["n_distinct"], s["n_distinct"], v["n_distinct"]) == (4, 3, 2)
    # native-typed extremes, cast after: 2.0 < 10.5 numerically even
    # though "10.5" < "2.0" lexicographically
    assert (v["min_value"], v["max_value"]) == ("2.0", "10.5")
    assert (k["min_value"], k["max_value"]) == ("1", "4")


def test_approx_path_has_no_expand(spark):
    """Exact multi-column distinct plans an Expand (rows replicated per
    distinct column); the HLL path must not — that's the whole reason it
    is the 100 TB default."""
    df = _frame(spark)
    exact_plan = profile_columns(df)._jdf.queryExecution() \
        .executedPlan().toString()
    approx_plan = profile_columns(df, approx=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


def test_approx_distincts_close_to_exact(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 137).alias("m"))
    out = {r["col_name"]: r["n_distinct"] for r in
           profile_columns(df, approx=True).collect()}
    assert abs(out["k"] - 5000) / 5000 < 0.1
    assert abs(out["m"] - 137) / 137 < 0.1
