package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/date column functions (SURVEY §2.5 F1/F4/F7/F9).
  *
  * Semantics pinned against the reference:
  *  - ms-vs-s epoch heuristic (`value > 1e10` means milliseconds) —
  *    reference clickhouse/helpers.py:74-76 and :108-113.
  *  - `WeekFrom` = previous Saturday, same day if already Saturday
  *    (dateutil `SA(-1)`) — reference clickhouse/helpers.py:78-82.
  *  - `dd/MM/yyyy` report formatting — reference clickhouse/helpers.py:81-82.
  *  - hour truncation / yyyyMMdd partition key (ClickHouse `toStartOfHour`,
  *    `toYYYYMMDD`) — reference clickhouse/clickhouse.py:75, :40.
  *
  * All pure builtins: codegen'd, foldable where literal, and usable as
  * partition expressions for pruning at scale.
  */
object TimeFns {

  /** Epoch (seconds OR milliseconds, disambiguated by magnitude) -> timestamp
    * with millisecond precision. Matches helpers.py:74-76: `>1e10` = ms.
    */
  def epochToTimestamp(epoch: Column): Column =
    when(epoch > lit(1e10), timestamp_millis(epoch.cast("long")))
      .otherwise(timestamp_millis((epoch.cast("double") * 1000).cast("long")))

  /** Previous Saturday (same day if the date is already a Saturday).
    * Spark dayofweek: Sun=1 .. Sat=7, so `dayofweek % 7` is the number of
    * days since the most recent Saturday.
    */
  def prevSaturday(d: Column): Column = date_sub(d, dayofweek(d) % 7)

  /** `dd/MM/yyyy` (reference report format, helpers.py:81-82). */
  def ddMMyyyy(d: Column): Column = date_format(d, "dd/MM/yyyy")

  /** ClickHouse `toStartOfHour` analog (clickhouse.py:75). */
  def toStartOfHour(ts: Column): Column = date_trunc("hour", ts)

  /** ClickHouse `toYYYYMMDD` analog — day partition key (clickhouse.py:40). */
  def toYYYYMMDD(ts: Column): Column = date_format(ts, "yyyyMMdd")
}
