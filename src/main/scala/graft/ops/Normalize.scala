package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Event-normalization operators (SURVEY §2.5 F1-F6).
  *
  * The reference applies these per-row in Python generators
  * (reference: clickhouse/helpers.py:11-128, etl.py:32-45); here each is a
  * metadata-only or codegen'd DataFrame transform, so the whole
  * normalization chain fuses into one whole-stage-codegen pass over the
  * scan — no per-row interpreter at any scale.
  */
object Normalize {

  /** The reference's event-key rename map (semantics of
    * clickhouse/helpers.py:13-47): QRadar function-echo keys and raw field
    * names -> canonical report column names. Note `userName`/`username`
    * case-merge to `Username` and the `CustomProperty~null` -> `bad_key`
    * quarantine entry.
    */
  val renameMap: Map[String, String] = Map(
    "DomainName(DomainID)" -> "domainName",
    "domainId" -> "Domain",
    "DomainAwareFullNetworkName(SourceIP, DomainID)" -> "Source Network",
    "DomainAwareFullNetworkName(DestinationIP, DomainID)" -> "Destination Network",
    "DomainAwareFullNetworkName(SourceIP)" -> "Source Network",
    "DateFormatFunction(StartTime, dd/MM/yyyy)" -> "ReportDate",
    "SensorDeviceName(DeviceId)" -> "Log Source",
    "QidName(Qid)" -> "Event Name",
    "destinationIP" -> "Destination IP",
    "sourceIP" -> "Source IP",
    "Time" -> "Start Time",
    "qid" -> "QID",
    "SUM_eventCount" -> "Event Count",
    "CategoryName(Category)" -> "Low Level Category",
    "CategoryName(HighLevelCategory)" -> "High Level Category",
    "SensorDeviceTypeName(DeviceType)" -> "Log Source Type",
    "deviceType" -> "Log Source Type",
    "userName" -> "Username",
    "username" -> "Username",
    "magnitude" -> "Magnitude",
    "qidEventId" -> "Event ID",
    "Rule Name (custom)" -> "Rule Name",
    "destinationGeographicLocation" -> "Destination Geographic Country/Region",
    "sourceGeographicLocation" -> "Source Geographic Country/Region",
    "destinationPort" -> "Destination Port",
    "CustomProperty~null" -> "bad_key"
  )

  /** F2: apply the rename map. Purely a plan-level projection rename —
    * zero runtime cost. Colliding targets (the `userName`/`username`
    * case-merge) follow python dict-overwrite semantics exactly
    * (reference helpers.py:49): the column keeps the FIRST occurrence's
    * position but carries the LAST source column's values.
    */
  def renameEvents(df: DataFrame, mapping: Map[String, String] = renameMap): DataFrame = {
    // Select by POSITION (via a unique temp positional rename): name-based
    // selection is ambiguous under Spark's case-insensitive resolution for
    // exactly the case-merge pairs this map exists to handle.
    val tmp = df.toDF(df.columns.indices.map(i => s"__c$i"): _*)
    val targets = df.columns.map(c => mapping.getOrElse(c, c))
    val firstPos = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val lastSrc = scala.collection.mutable.Map.empty[String, Int]
    targets.zipWithIndex.foreach { case (t, i) =>
      if (!firstPos.contains(t)) firstPos(t) = i
      lastSrc(t) = i
    }
    val cols = firstPos.keysIterator.map(t => col(s"__c${lastSrc(t)}")).toSeq
    tmp.select(cols: _*).toDF(firstPos.keys.toSeq: _*)
  }

  /** F3: identifier cleaning — ` / ( ) ,` -> `_` (helpers.py:87-95).
    * Spark tolerates exotic names via backticks; we keep this for sink
    * compatibility (parquet/ClickHouse-style identifiers).
    */
  def cleanColumnName(name: String): String =
    name.replace(" ", "_").replace("/", "_").replace("(", "_")
      .replace(")", "_").replace(",", "_")

  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(cleanColumnName): _*)

  /** F6: customer/table-name sanitizer — strips ` ' " & _`
    * (reference: etl.py:68-77).
    */
  def sanitizeName(name: String): String =
    name.filterNot(c => c == ' ' || c == '\'' || c == '"' || c == '&' || c == '_')

  /** Column form of [[sanitizeName]] for data-level name cleaning. */
  def sanitizeNameCol(name: Column): Column =
    regexp_replace(name, "[ '\"&_]", "")

  /** F1: derive `ReportDate` (dd/MM/yyyy) and `WeekFrom` (previous Saturday,
    * dd/MM/yyyy) from the first present epoch column of `candidates`
    * (reference `Start Time` else `Time`, error when both missing —
    * helpers.py:68-71). The missing-columns case is an analysis-time error
    * here (fail fast at plan time rather than per row).
    */
  def addDateCols(df: DataFrame, candidates: Seq[String] = Seq("Start Time", "Time")): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    require(present.nonEmpty, s"Missing ${candidates.mkString("/")} column for date derivation")
    val epoch = coalesce(present.map(c => col(s"`$c`")): _*)
    val ts = TimeFns.epochToTimestamp(epoch)
    df.withColumn("ReportDate", TimeFns.ddMMyyyy(ts))
      .withColumn("WeekFrom", TimeFns.ddMMyyyy(TimeFns.prevSaturday(to_date(ts))))
  }

  /** Same derivation from an existing timestamp column (testdata `events.ts`
    * is already a timestamp).
    */
  def addDateColsFromTs(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("ReportDate", TimeFns.ddMMyyyy(col(tsCol)))
      .withColumn("WeekFrom", TimeFns.ddMMyyyy(TimeFns.prevSaturday(to_date(col(tsCol)))))
}
