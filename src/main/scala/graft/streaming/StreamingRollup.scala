package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming form of the engine (SURVEY §2.7 T1-T5): the same hourly
  * SummingMergeTree rollup computed incrementally over an unbounded stream.
  *
  * Semantics vs the reference: the reference accepts late rows forever and
  * double-counts replayed inserts (ClickHouse async_insert with
  * insert_deduplicate=False — reference clickhouse/clickhouse.py:19-21,:79).
  * The Spark-native form is strictly better and we deliberately do NOT
  * reproduce the replay double-count: a watermark bounds state, and
  * checkpointed micro-batches give exactly-once into idempotent sinks.
  * The delta is documented here and pinned by StreamingRollupSpec.
  *
  * Scale notes: the windowed aggregation shuffles on (window, dims) with
  * partial aggregation before the exchange, exactly like the batch path;
  * state store size is O(open windows x distinct dims), bounded by the
  * watermark horizon. At 100 TB/day the same code runs with more shuffle
  * partitions — no operator change.
  */
object StreamingRollup {

  /** T2/T3: watermarked tumbling-window hourly sum over `dims`.
    * Output schema: hour (window start), dims..., sumColName.
    */
  def hourly(stream: DataFrame, tsCol: String, measureCol: String,
             dims: Seq[String], lateness: String = "2 hours",
             sumColName: String = "sum_value"): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(
        (window(col(tsCol), "1 hour").as("w") +: dims.map(c => col(s"`$c`"))): _*)
      .agg(sum(col(s"`$measureCol`")).as(sumColName))
      .select((col("w.start").as("hour") +: dims.map(c => col(s"`$c`")) :+ col(sumColName)): _*)

  /** T1: micro-batch cadence — the reference's fixed-size row batching
    * (etl.py:35-45) maps to trigger-based micro-batches; `interval` empty
    * means AvailableNow (drain-and-stop, the batch-parity mode).
    */
  def withCadence[T](w: DataStreamWriter[T], interval: String): DataStreamWriter[T] =
    if (interval.isEmpty) w.trigger(Trigger.AvailableNow())
    else w.trigger(Trigger.ProcessingTime(interval))

  /** S7-analog streaming sink: an Append-mode parquet writeStream with
    * exactly-once checkpointing. For external push sinks (the reference's
    * ClickHouse/Druid HTTP landings — clickhouse/clickhouse.py:60-67,
    * druid/push_streaming.py:59-82) use [[HttpPushSink.writer]], the
    * foreachBatch seam with retry/backoff and batchId idempotency.
    */
  def startParquetSink(rollup: DataFrame, path: String, checkpoint: String,
                       interval: String = "") = {
    val writer = rollup.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
    withCadence(writer, interval).start()
  }

  /** The Kafka record shaping alone (spec-pinned without a broker by
    * StreamingRollupSpec): key = sha256 of the GROUP columns only
    * (`keyCols`), so successive updates of one (hour, dims) group keep
    * partition affinity — hashing the measure too would scatter a group's
    * updates across partitions. Null-safe: the key is field-named JSON,
    * so ("a", null) and (null, "a") serialize differently (concat_ws
    * would drop nulls and collide them). Pure column exprs, identical on
    * batch and streaming frames.
    */
  def kafkaPayload(rollup: DataFrame, keyCols: Seq[String]): DataFrame =
    rollup.select(
      sha2(to_json(struct(keyCols.map(col): _*)), 256).as("key"),
      to_json(struct(rollup.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** S8-analog: Kafka sink wiring over [[kafkaPayload]] (SASL/PLAIN shape
    * mirrors the reference's producer — mykafka/producer.py:7-20).
    * Built-in `format("kafka")` does batching/retries/idempotence; no
    * custom code. Unused in tests (no broker in the container).
    */
  def kafkaSinkWriter(rollup: DataFrame, bootstrap: String, topic: String,
                      keyCols: Seq[String],
                      saslJaas: Option[String] = None): DataStreamWriter[Row] = {
    val payload = kafkaPayload(rollup, keyCols)
    val w = payload.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
    saslJaas.fold(w)(jaas => w
      .option("kafka.security.protocol", "SASL_PLAINTEXT")
      .option("kafka.sasl.mechanism", "PLAIN")
      .option("kafka.sasl.jaas.config", jaas))
  }

  /** S1/S3-analog streaming source: a file-drop JSON source with a pinned
    * schema (streaming requires one — the batch-side inference of
    * Tables.readJsonUnioned supplies it).
    *
    * T5 backpressure: `maxFilesPerTrigger` bounds each micro-batch's input
    * at the source — the file-source analog of Kafka's
    * `maxOffsetsPerTrigger` and of the reference's synchronous chunk pull
    * (etl.py:57-90, one HTTP Range slice in flight at a time). Honoured by
    * AvailableNow too: a backlog drains as a SEQUENCE of bounded batches
    * instead of one unbounded one — the property that keeps executor
    * memory flat when a stream restarts into a deep backlog at scale.
    * `StreamingRollupSpec` pins the per-batch bound via
    * StreamingQueryProgress.numInputRows.
    */
  def jsonFileSource(spark: SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).json(path)
  }
}
