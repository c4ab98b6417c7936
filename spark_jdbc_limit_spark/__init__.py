"""spark_jdbc_limit_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``lightcopy/spark-jdbc-limit`` (a Spark 2.2 JDBC
limit-pushdown + transactional-write extension), re-expressed Spark-first:

- the reference's custom Catalyst rule / relation / RDD machinery
  (reference: src/main/scala/org/apache/spark/sql/PropagateJDBCLimit.scala:14-28,
  JDBCRelationWithLimit.scala:15-85, JDBCRDDWithLimit.scala:16-143) is
  subsumed by Spark 4 built-ins (DSv2 limit/filter/column pushdown), so this
  engine declares plans with the DataFrame/SQL API and verifies that the
  optimizations fire (see :mod:`spark_jdbc_limit_spark.plans.verify`);
- the reference's transactional write protocol
  (reference: ExtJdbcUtils.scala:70-109) is replaced by a portable
  staging+atomic-publish sink (see :mod:`spark_jdbc_limit_spark.sinks`);
- the full relational operator surface the reference's workloads exercise
  through host Spark (SURVEY.md §2B) is exposed as a typed query catalog
  (see :mod:`spark_jdbc_limit_spark.operators`), each query paired with a
  DuckDB oracle for differential testing;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) extend the surface for 100 TB-scale pipelines.
"""

from __future__ import annotations

__version__ = "0.1.0"

from spark_jdbc_limit_spark.session import build_session

__all__ = ["build_session", "__version__"]
