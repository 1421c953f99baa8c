package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: `SparkEntry.entry` must return rows > 0 on a
  * PLAIN session (no UTC config, no extensions, no nanos conf) — exactly
  * what the driver constructs. Guards the events TIMESTAMP(NANOS) handling
  * and any future query that silently assumes a session option.
  */
class EntrySmokeSpec extends AnyFunSuite {
  test("entry returns rows on an unconfigured session at sf0.001") {
    // reuse the shared test session's JVM but verify no special conf is
    // needed at query-build time: entry sets everything it requires itself.
    // The shared session must own the JVM default FIRST — getOrCreate
    // binds STATIC confs (spark.sql.extensions) at creation, so if this
    // suite ran first in an ad-hoc testOnly pair, every later plan-shape
    // spec would silently test stock Spark (the r6 gotcha, order-shaped).
    TestSpark.spark
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    // every registered query must at least build a plan on a plain session
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001")
      assert(plan.columns.nonEmpty, name)
    }
    // and every query has a matching oracle or is deliberately oracle-free
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
