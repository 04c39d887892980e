package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  private def allDefs: Seq[(String, QueryDef)] =
    Relational.defs ++ Etl.defs ++ TextOps.defs ++ Dedup.defs ++
      Similarity.defs ++ Temporal.defs ++ Multimodal.defs ++ Skew.defs ++
      Pipeline.defs ++ Sketches.defs ++ Training.defs ++ Graph.defs ++
      WebOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q6_multijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}
