package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table readers over the engine's parquet storage (SURVEY §2.1 S3/S5/S7).
  *
  * The reference streams JSON search results and lands them in ClickHouse
  * (reference: etl.py:57-65, clickhouse/clickhouse.py:60-67); the engine's
  * native storage is partitioned parquet, read through Spark's vectorized
  * reader (columnar, predicate/column pushdown for free).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** The events table ships with parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read the raw nanos as Long (legacy conf) and
    * truncate to microseconds with integer `div` — a double-precision
    * division would corrupt ~1.7e18 nanosecond values (2^53 < 1.7e18).
    * DuckDB truncates ns->us the same way, so oracles agree.
    */
  /** GraftSession.builder sets the nanos conf at session build; this
    * guard is the fallback for externally-built sessions, and never
    * mutates a session that is already configured (no global side effect
    * on the hot read path). Every reader that touches events.parquet —
    * including streaming-source schema probes — must go through it.
    */
  def ensureNanosConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosConf(spark)
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** S4/S5 analog with the first-row-schema bug fixed: the reference infers
    * each batch's schema from its FIRST event only, silently dropping keys
    * that appear later (reference: clickhouse/helpers.py:166-169). Spark's
    * JSON reader already schema-unions across ALL rows and partitions;
    * this wrapper additionally lets callers pin a schema for streaming use.
    */
  def readJsonUnioned(spark: SparkSession, path: String,
                      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}
