package graft

import org.apache.spark.sql.functions._
import graft.streaming.Observability

/** A4/T7/O5: in-job metrics via observe + listener harvest. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("observe counts rows and sums the measure inside the job") {
    val sink = Observability.attach(spark)
    try {
      val df = Seq(("a", 1L), ("b", 2L), ("c", 4L)).toDF("k", "v")
      val observed = Observability.observed(df, "ingest", Some("v"))
      observed.filter(col("v") > 1).count() // any action triggers harvest
      // listener callbacks are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      var row: Option[org.apache.spark.sql.Row] = None
      while (row.isEmpty && System.currentTimeMillis() < deadline) {
        row = sink.metrics.synchronized {
          sink.metrics.find(_._1 == "ingest").map(_._2)
        }
        if (row.isEmpty) Thread.sleep(100)
      }
      assert(row.isDefined, "observed metrics never arrived")
      // observe sees PRE-filter rows: the metric point is pipeline
      // accounting (reference record_count), not result cardinality
      assert(row.get.getAs[Long]("rows") === 3L)
      assert(row.get.getAs[Long]("measure_total") === 7L)
    } finally spark.listenerManager.unregister(sink)
  }
}
