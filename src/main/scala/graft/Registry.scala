package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark implementation and, where the
  * semantics are SQL-expressible, a DuckDB oracle that must produce the
  * identical result on the same parquet tables (driver hash-compares
  * after sorting columns by name).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(sql))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
