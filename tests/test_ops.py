"""Tests for file connectors (CSV/JSON, partitioned writes + pruning),
salted aggregation, and vector-store compaction."""

import glob
import io
import contextlib

import pyspark.sql.functions as F

from flink_rag_spark.operators.maintenance import compact_store, store_file_count
from flink_rag_spark.operators.skew import salted_agg
from flink_rag_spark.plans.relational import dec2
from flink_rag_spark.sources.files import (
    read_csv,
    read_json,
    read_pruned,
    write_csv,
    write_json,
    write_partitioned,
)
from flink_rag_spark.sources.tables import load_table


def test_csv_json_roundtrip(spark, sf_smoke, tmp_path):
    n = load_table(spark, sf_smoke, "nation")
    write_csv(n, str(tmp_path / "n_csv"))
    back = read_csv(spark, str(tmp_path / "n_csv"),
                    "n_nationkey int, n_name string, n_regionkey int")
    assert sorted(r["n_name"] for r in back.collect()) == \
           sorted(r["n_name"] for r in n.collect())
    write_json(n, str(tmp_path / "n_json"))
    backj = read_json(spark, str(tmp_path / "n_json"),
                      "n_nationkey int, n_name string, n_regionkey int")
    assert backj.count() == n.count()


def test_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    e = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(e, path, ["event_type"])
    # directory layout exists per partition value
    assert glob.glob(f"{path}/event_type=click")
    pruned = read_pruned(spark, path).filter(F.col("event_type") == "click")
    # the physical plan must scan ONLY the matching partition directory
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan
    expected = e.filter(F.col("event_type") == "click").count()
    assert pruned.count() == expected


def test_fixedwidth_datasource(spark, tmp_path):
    from flink_rag_spark.sources.fixedwidth import register_fixedwidth
    register_fixedwidth(spark)
    d = tmp_path / "fw"
    d.mkdir()
    (d / "part1.txt").write_text("alpha    12      3.50\nbeta      7     10.25\n")
    (d / "part2.txt").write_text("gamma    99      0.75\n")
    df = (spark.read.format("fixedwidth")
          .schema("name string, qty int, price double")
          .option("widths", "8,4,10")
          .load(str(d)))
    rows = {(r["name"], r["qty"], r["price"]) for r in df.collect()}
    assert rows == {("alpha", 12, 3.50), ("beta", 7, 10.25), ("gamma", 99, 0.75)}
    # one partition per file
    assert df.rdd.getNumPartitions() == 2
    # filters/projections still compose on top of the custom source
    assert df.filter(F.col("qty") > 10).count() == 2


def test_salted_agg_matches_direct(spark, sf_smoke):
    e = load_table(spark, sf_smoke, "events")
    direct = {(r["user_id"], r["n"], r["total"]) for r in
              e.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(dec2("value")).cast("double").alias("total"))
               .collect()}
    salted = {(r["user_id"], r["n"], r["total"]) for r in
              salted_agg(e, ["user_id"],
                         {"n": ("count", "event_id"),
                          "total": ("sum", dec2("value"))}, salts=8)
              .select("user_id", "n", F.col("total").cast("double"))
              .collect()}
    assert direct == salted


def test_salted_agg_skewed_key_spreads_and_is_deterministic(spark, sf_smoke):
    # one hot user owns 50% of rows: the shape salting exists for
    e = load_table(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    hot = e.withColumn("user_id", F.when(F.col("event_id") % 2 == 0, F.lit(-1))
                       .otherwise(F.col("user_id")))
    direct = {(r["user_id"], r["n"], float(r["total"])) for r in
              hot.groupBy("user_id")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(dec2("value")).cast("double").alias("total"))
                 .collect()}
    out = salted_agg(hot, ["user_id"],
                     {"n": ("count", "event_id"),
                      "total": ("sum", dec2("value"))}, salts=8)
    salted = {(r["user_id"], r["n"], float(r["total"])) for r in
              out.select("user_id", "n", F.col("total").cast("double")).collect()}
    assert direct == salted
    # the hot key's rows actually spread over multiple salt buckets
    salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
    n_buckets = (hot.filter(F.col("user_id") == -1)
                 .select(salt_expr.alias("s")).distinct().count())
    assert n_buckets >= 4
    # salt is a pure function of row contents: stable under repartition
    per_bucket = lambda df: {(r["s"], r["n"]) for r in
                             df.filter(F.col("user_id") == -1)
                               .select(salt_expr.alias("s"))
                               .groupBy("s").agg(F.count(F.lit(1)).alias("n"))
                               .collect()}
    assert per_bucket(hot) == per_bucket(hot.repartition(13))


def test_compact_store(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    d = load_table(spark, sf_smoke, "documents").limit(50)
    # simulate many small micro-batch appends
    for i in range(5):
        (d.filter(F.col("doc_id") % 5 == i)
         .select("doc_id", "text").repartition(4)
         .write.mode("append").parquet(store))
    before = store_file_count(store)
    assert before >= 10
    rows_before = spark.read.parquet(store).count()
    after = compact_store(spark, store, target_partitions=2)
    assert after == 2
    assert spark.read.parquet(store).count() == rows_before


def _bucketed_store(spark, tmp_path, ids):
    """A store with the ingest layout: partitioned by
    bucket = pmod(vec_id, STORE_BUCKETS)."""
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS
    store = str(tmp_path / "bstore")
    df = spark.createDataFrame([(i, f"text {i}") for i in ids],
                               "vec_id long, text string")
    (df.withColumn("bucket",
                   F.pmod(F.col("vec_id"), F.lit(STORE_BUCKETS)).cast("int"))
     .repartition("bucket").write.partitionBy("bucket").parquet(store))
    return store


def test_delete_from_store_prunes_to_touched_buckets(spark, tmp_path):
    """Deletion rewrites ONLY the buckets holding the ids: other bucket
    files stay byte-identical in place (O(touched), not O(store))."""
    import glob
    import os

    from flink_rag_spark.operators.maintenance import delete_from_store
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS

    ids = list(range(200))
    store = _bucketed_store(spark, tmp_path, ids)
    victims = [3, 3 + STORE_BUCKETS]  # both in bucket 3

    def snapshot(b):
        return {f: os.path.getmtime(f) for f in
                glob.glob(f"{store}/bucket={b}/*.parquet")}

    untouched = {b: snapshot(b) for b in (0, 1, 2, 4, 5)}
    n = delete_from_store(spark, store, victims)
    assert n == 2
    left = {r["vec_id"] for r in spark.read.parquet(store).collect()}
    assert left == set(ids) - set(victims)
    for b, snap in untouched.items():
        assert snapshot(b) == snap, f"bucket {b} was rewritten"


def test_delete_from_store_empties_whole_bucket(spark, tmp_path):
    """Deleting every row of a bucket removes its directory (dynamic
    overwrite alone would leave the stale files in place)."""
    import os

    from flink_rag_spark.operators.maintenance import delete_from_store
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS

    # bucket 7 holds exactly two ids; everything else lives elsewhere
    ids = [7, 7 + STORE_BUCKETS, 1, 2, 3]
    store = _bucketed_store(spark, tmp_path, ids)
    n = delete_from_store(spark, store, [7, 7 + STORE_BUCKETS])
    assert n == 2
    assert not os.path.exists(f"{store}/bucket=7")
    assert {r["vec_id"] for r in spark.read.parquet(store).collect()} \
        == {1, 2, 3}


def test_delete_from_store_flat_fallback(spark, tmp_path):
    from flink_rag_spark.operators.maintenance import delete_from_store

    store = str(tmp_path / "flat")
    spark.createDataFrame([(i, f"t{i}") for i in range(20)],
                          "vec_id long, text string").write.parquet(store)
    assert delete_from_store(spark, store, [4, 5]) == 2
    assert spark.read.parquet(store).count() == 18
    assert delete_from_store(spark, store, []) == 0
