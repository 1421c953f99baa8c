package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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

  /** GraftSession.builder sets the nanos conf at session build; this
    * guard is the fallback for externally-built sessions, and never
    * mutates a session that is already configured (no global side effect
    * on the hot read path). It only affects parquet TIMESTAMP(NANOS)
    * fixtures (read as raw Long); TIMESTAMP(MICROS/MILLIS) fixtures are
    * untouched by it. Every reader that touches events.parquet —
    * including streaming-source schema probes — must go through it so the
    * LongType branch of [[normalizeTs]] stays reachable on nanos data.
    */
  def ensureNanosConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize the fixture `ts` column to a UTC-instant TimestampType,
    * dispatching on the SCANNED dtype — the fixture's physical encoding has
    * changed across rounds (TIMESTAMP(NANOS) read as raw Long via
    * `nanosAsLong` through round 5; TIMESTAMP(MICROS) read as
    * timestamp_ntz from round 6) and the engine must absorb either without
    * edits. One loud error for anything else beats 61 scattered
    * DATATYPE_MISMATCH failures (the fixture-schema tripwire; cf. the
    * reference's own first-row-schema bug, SURVEY §1.2).
    *
    *  - raw-nanos Long: integer `div 1000` to µs — a double-precision
    *    division would corrupt ~1.7e18 ns values (2^53 < 1.7e18); DuckDB
    *    truncates ns→µs the same way, so oracles agree.
    *  - timestamp_ntz: the wall-clock IS UTC by fixture contract, so the
    *    NTZ→instant cast is value-preserving only under a UTC session TZ
    *    (enforced here; GraftSession pins it). Anything else would shift
    *    every value against the DuckDB oracle's native `epoch_us(ts)`.
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.$name is TIMESTAMP_NTZ; converting it to an instant requires " +
            s"spark.sql.session.timeZone=UTC (got '$tz') to preserve the UTC oracle contract")
        df.withColumn(name, col(name).cast(TimestampType))
      case LongType =>
        df.withColumn(name, timestamp_micros(expr(s"$name div 1000")))
      case other => throw new IllegalStateException(
        s"events.$name is ${other.simpleString}; the engine expects timestamp, " +
          "timestamp_ntz, or raw-nanos bigint. The fixture schema has drifted — " +
          "extend graft.sources.Tables.normalizeTs for the new encoding.")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosConf(spark)
    normalizeTs(read(spark, dir, "events"))
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
