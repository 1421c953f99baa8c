package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Rollup
import graft.plans.RollupNavigation
import graft.queries.Enrich
import graft.sources.Tables

/** Diagnostic for the GRAIN LADDER's SCALE.md row: the same monthly
  * dashboard (month × event_type; COUNT/MIN/MAX/SUM) timed three ways —
  * raw events scan (no registration), hourly rollup only, and the full
  * hourly+daily+monthly ladder (coarsest rung wins). Also prints the
  * store row counts, the measured ratio the selection buys. Warm-timed:
  * each variant runs twice, second time reported (codegen paid once).
  */
object NavDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // optional span replication: N time-shifted copies of the fixture (5
    // months apart, so the span grows to ~N*5 months — the multi-year
    // store where rung choice matters; row counts scale with the span)
    val span = if (args.length > 1) args(1).toInt else 1
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw0 = Enrich.securityEvents(Tables.events(spark, dir))
    val raw =
      if (span <= 1) raw0
      else {
        val shifted = (0 until span).map(i =>
          raw0.withColumn("ts", expr(s"timestampadd(MONTH, ${5 * i}, ts)")))
        val u = shifted.reduce(_ union _)
        val p = java.nio.file.Files
          .createTempDirectory("graft_navdiag_raw_").toString
        u.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
    val base = java.nio.file.Files.createTempDirectory("graft_navdiag_").toString
    Rollup.hourlyStats(raw, "ts", "value", dims = Seq("event_type"),
        hourColName = "hour")
      .write.mode("overwrite").parquet(s"$base/hourly")
    Rollup.reaggregateStats(spark.read.parquet(s"$base/hourly"), "hour",
        "day", Seq("event_type"))
      .write.mode("overwrite").parquet(s"$base/daily")
    Rollup.reaggregateStats(spark.read.parquet(s"$base/daily"), "bucket",
        "month", Seq("event_type"))
      .write.mode("overwrite").parquet(s"$base/monthly")
    val nRaw = raw.count()
    val nH = spark.read.parquet(s"$base/hourly").count()
    val nD = spark.read.parquet(s"$base/daily").count()
    val nM = spark.read.parquet(s"$base/monthly").count()
    println(s"DIAG rows raw=$nRaw hourly=$nH daily=$nD monthly=$nM")

    def dashboard() = raw
      .groupBy(date_trunc("month", col("ts")).as("m0"), col("event_type"))
      .agg(count(lit(1)).as("n"), min("value").as("mn"),
        max("value").as("mx"), sum("value").as("sv"))
    def time(label: String): Double = {
      dashboard().collect() // warm: codegen + page cache
      val t0 = System.nanoTime()
      val n = dashboard().collect().length
      val s = (System.nanoTime() - t0) / 1e9
      println(f"DIAG $label%-12s $s%.3fs rows=$n")
      s
    }
    def reg(rung: String, tc: String, g: String): Unit =
      RollupNavigation.register(spark, raw, "ts", Seq("event_type"), "value",
        s"$base/$rung", tc, "sum_value", cntCol = Some("cnt"),
        minCol = Some("min_value"), maxCol = Some("max_value"),
        cntMeasureCol = Some("cnt_measure"), grain = g)

    val tRaw = time("raw")
    reg("hourly", "hour", "hour")
    val tHourly = time("hourly-nav")
    reg("daily", "bucket", "day"); reg("monthly", "bucket", "month")
    val tLadder = time("ladder-nav")
    println(f"DIAG speedup raw/hourly=${tRaw / tHourly}%.1fx " +
      f"raw/ladder=${tRaw / tLadder}%.1fx hourly/ladder=${tHourly / tLadder}%.1fx")
    RollupNavigation.clear()
    spark.stop()
  }
}
