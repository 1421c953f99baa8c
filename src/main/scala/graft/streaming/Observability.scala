package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Pipeline observability (SURVEY §2.4 A4 / §2.7 T7 / §2.8 O5): the
  * reference tracks progress with a tqdm bar fed by the result-count header
  * and loguru-structured logs (reference etl.py:25-29, pipeline_logger.py:
  * 16-29). The Spark-native form is `Dataset.observe` metrics — computed
  * inside the running job with zero extra passes — plus a
  * QueryExecutionListener that harvests them per completed action.
  */
object Observability {

  /** Attach row/measure counters to a frame under `name`. The metrics ride
    * the existing job (accumulator-backed), unlike a separate `count()`.
    */
  def observed(df: DataFrame, name: String, measureCol: Option[String] = None): DataFrame =
    measureCol match {
      case Some(m) => df.observe(name, count(lit(1)).as("rows"),
        sum(col(m)).as("measure_total"))
      case None => df.observe(name, count(lit(1)).as("rows"))
    }

  /** Harvested metrics: (observation name -> metric row), newest last. */
  final class MetricsSink extends QueryExecutionListener {
    val metrics = mutable.ArrayBuffer.empty[(String, Row)]
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        metrics.synchronized { metrics += name -> row }
      }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Register a sink on the session; caller reads `sink.metrics`. */
  def attach(spark: SparkSession): MetricsSink = {
    val sink = new MetricsSink
    spark.listenerManager.register(sink)
    sink
  }
}
