from flink_rag_spark.plans.catalog import QUERIES, query_fns, oracle_sqls

__all__ = ["QUERIES", "query_fns", "oracle_sqls"]
