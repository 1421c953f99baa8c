package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic security-event enrichment of the synthetic `events` table.
  *
  * The reference's AQL corpus (reference: qradar/input/queries.json:2-3)
  * filters on IPs, ports and category codes that the driver's synthetic
  * `events` table does not carry. To execute those operators *natively* and
  * still oracle-check them in DuckDB, we derive the security columns
  * deterministically from `event_id`/`user_id` with integer arithmetic that
  * is expressible identically in Spark and ANSI SQL. `sqlCte` below is the
  * DuckDB-side mirror of `securityEvents` — the two MUST stay in sync
  * (the driver's hash-compare enforces it every round).
  *
  * Column semantics (AQL analog in parens):
  *  - source_ip / destination_ip (sourceip/destinationip): mix of RFC1918,
  *    public, and loopback-adjacent addresses so CIDR predicates have
  *    non-trivial selectivity.
  *  - destination_port (destinationport), category/highlevelcategory,
  *  - domain_id (domainId, 0..24 -> `nation` dim = DOMAINNAME lookup),
  *  - qid (qid, 0..199 -> `part` dim = QIDNAME lookup),
  *  - device_type (devicetype, 0..4 -> `region` dim = LOGSOURCETYPENAME).
  */
object Enrich {

  private def s(c: Column): Column = c.cast("string")

  /** Spark-side derivation. Keep in lock-step with [[sqlCte]]. */
  def securityEvents(events: DataFrame): DataFrame = {
    val e = col("event_id")
    val u = col("user_id")
    val srcIp =
      when(e % 4 === 0, concat(lit("10."), s(u % 256), lit("."), s((e / 7).cast("long") % 256), lit("."), s(e % 256)))
        .when(e % 4 === 1, concat(lit("172."), s(lit(16) + e % 16), lit("."), s(u % 256), lit("."), s((e / 3).cast("long") % 256)))
        .when(e % 4 === 2, concat(lit("192.168."), s(u % 256), lit("."), s(e % 256)))
        .otherwise(concat(lit("203.0."), s(u % 114), lit("."), s(e % 256)))
    val dstIp =
      when(e % 3 === 0, concat(lit("10.99."), s(u % 256), lit("."), s(e % 256)))
        .when(e % 3 === 1, concat(lit("8.8."), s(u % 256), lit("."), s(e % 256)))
        .otherwise(concat(lit("172."), s(lit(16) + u % 16), lit(".5."), s(e % 256)))
    events
      .withColumn("source_ip", srcIp)
      .withColumn("destination_ip", dstIp)
      .withColumn("destination_port", (e * 131) % 1000)
      .withColumn("category", lit(4000L) + e % 48)
      .withColumn("highlevelcategory", lit(3000L) + (u % 2) * 1000)
      .withColumn("domain_id", (u % 25).cast("int"))
      .withColumn("qid", e % 200)
      .withColumn("device_type", (e % 5).cast("int"))
  }

  /** DuckDB mirror of [[securityEvents]] as a CTE body. Oracle queries embed
    * it as `WITH e AS ($sqlCte) SELECT ...`.
    */
  val sqlCte: String =
    """SELECT event_id, ts, user_id, event_type, value,
      |  CASE CAST(event_id % 4 AS INT)
      |    WHEN 0 THEN '10.' || (user_id % 256) || '.' || ((event_id // 7) % 256) || '.' || (event_id % 256)
      |    WHEN 1 THEN '172.' || (16 + event_id % 16) || '.' || (user_id % 256) || '.' || ((event_id // 3) % 256)
      |    WHEN 2 THEN '192.168.' || (user_id % 256) || '.' || (event_id % 256)
      |    ELSE '203.0.' || (user_id % 114) || '.' || (event_id % 256)
      |  END AS source_ip,
      |  CASE CAST(event_id % 3 AS INT)
      |    WHEN 0 THEN '10.99.' || (user_id % 256) || '.' || (event_id % 256)
      |    WHEN 1 THEN '8.8.' || (user_id % 256) || '.' || (event_id % 256)
      |    ELSE '172.' || (16 + user_id % 16) || '.5.' || (event_id % 256)
      |  END AS destination_ip,
      |  (event_id * 131) % 1000 AS destination_port,
      |  4000 + event_id % 48 AS category,
      |  3000 + (user_id % 2) * 1000 AS highlevelcategory,
      |  CAST(user_id % 25 AS INT) AS domain_id,
      |  event_id % 200 AS qid,
      |  CAST(event_id % 5 AS INT) AS device_type
      |FROM events""".stripMargin
}
