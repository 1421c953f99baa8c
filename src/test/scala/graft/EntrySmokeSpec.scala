package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke over the SHARED harness session: every query
  * builds a plan, `entry` returns rows, and the oracle map is total.
  *
  * NOTE this does NOT exercise an unconfigured session: once TestSpark has
  * created the context, `spark.sql.extensions` (a static conf living in the
  * SparkContext conf) re-applies to every in-JVM session, so a truly plain
  * session is unreachable here. The plain-session property — entry
  * self-configures on the driver's fresh JVM — is checked by the driver's
  * own smoke step (fresh `SparkSession.builder().getOrCreate()` per round),
  * not by this spec.
  */
class EntrySmokeSpec extends AnyFunSuite {
  test("entry returns rows and all queries plan on the shared session at sf0.001") {
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
