package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{AnalyticsQueries, DocQueries, EventQueries, PipelineQueries, QualityQueries, TpchQueries, ViewQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps SURVEY §2 operator ids to native Spark implementations;
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The A1 hourly rollup with the full AQL filter stack (SURVEY §2.4 A1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a1_hourly_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ TpchQueries.queries ++ DocQueries.queries ++
      ViewQueries.queries ++ PipelineQueries.queries ++ QualityQueries.queries ++
      AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ TpchQueries.oracles ++ DocQueries.oracles ++
      ViewQueries.oracles ++ PipelineQueries.oracles ++ QualityQueries.oracles ++
      AnalyticsQueries.oracles
}
