package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.sources.Tables

/** q_join_bloom attribution + value measurement (r13 verdict #5): times the
  * custom md5-bloom semi-join against (a) its own pieces, (b) the plain
  * broadcast semi join with no prefilter, and (c) Spark's AQE runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) — so the custom operator's
  * value is measured, not assumed. Warm-timed, min of `reps`.
  */
object BloomDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Long): Unit = {
      body // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"BLOOM $label%-22s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }

    def dim() = Tables.orders(spark, dir).filter(col("o_totalprice") > 475000.0)
      .select("o_orderkey")

    time("dim-count") { dim().count() }
    time("bloom-build") { Bloom.build(dim(), col("o_orderkey").cast("string"),
      k = 4, mBits = 1 << 16).length.toLong }
    val bm = Bloom.build(dim(), col("o_orderkey").cast("string"), k = 4, mBits = 1 << 16)
    time("fact-scan") { Tables.lineitem(spark, dir).count() }
    time("fact-bloomfilter") {
      Tables.lineitem(spark, dir)
        .filter(Bloom.mightContain(col("l_orderkey").cast("string"), bm,
          k = 4, mBits = 1 << 16)).count()
    }
    def full() = graft.SparkEntry.queries("q_join_bloom")(spark, dir).count()
    time("full-query") { full() }
    def plainSemi() = Tables.lineitem(spark, dir)
      .join(broadcast(dim()), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .count()
    time("plain-bcast-semi") { plainSemi() }
    // Spark's own runtime bloom: needs a SHUFFLE join to inject into (the
    // broadcast hint would bypass it), creationSideThreshold raised over
    // the tiny dim aggregate, and the application side must exceed
    // applicationSideScanSizeThreshold — set to 0 to force injection.
    def aqeBloom() = {
      Tables.lineitem(spark, dir)
        .join(dim().hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .count()
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    time("aqe-runtime-bloom") { aqeBloom() }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    time("shuffle-semi-nobloom") { aqeBloom() }
    spark.stop()
  }
}
