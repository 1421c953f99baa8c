package graft.streaming

import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** S9-analog push sink with O3 retry semantics: the reference gzips each
  * row batch and POSTs it to Druid's HTTP ingest
  * (reference: druid/push_streaming.py:59-82), retrying via tenacity
  * (reference: qradar/search_executor.py:13-20). The Spark-native seam is
  * `foreachBatch`: every micro-batch partition is serialized to JSON
  * lines, gzipped, and handed to an injected [[Transport]] under
  * exponential-backoff retry.
  *
  * Delivery contract: at-least-once. A batch that fails after some
  * partitions posted is replayed from the checkpoint on recovery; the
  * (batchId, partitionId) pair travels with every payload so an
  * idempotent receiver deduplicates replays — the guard the reference
  * lacks (its ClickHouse path double-counts replayed inserts, documented
  * in [[StreamingRollup]]).
  *
  * Scale note: serialization, gzip, and the POST all run per partition ON
  * the executors; the driver never materializes a batch. (The reference
  * POSTs everything from one process — the single-node bottleneck this
  * design removes.)
  */
object HttpPushSink {

  /** (batchId, partitionId, gzippedJsonLines) => HTTP status code.
    * Must be serializable — it ships to executors.
    */
  type Transport = (Long, Int, Array[Byte]) => Int

  /** O4: the HTTP error taxonomy (reference:
    * qradar/qradarconnector.py:23-48 QRadarClientError/QRadarServerError,
    * druid/push_streaming.py:31-56, raised at push_streaming.py:72-80).
    * The reference classifies into 4xx client / 5xx server errors but its
    * tenacity decorator retries both; here the classification DRIVES the
    * retry decision, which is what the taxonomy is for at scale: a 400/401/
    * 404/422 is deterministic — replaying the identical payload through a
    * checkpoint recovery can never fix it, and on a 1000-executor job a
    * blind backoff loop on a fatal status turns one bad batch into
    * maxAttempts × numPartitions doomed POSTs before the job fails anyway.
    */
  sealed abstract class HttpPushError(val status: Int, body: String)
    extends java.io.IOException(s"HTTP $status: $body")

  /** 4xx minus the two retryable ones — the request itself is wrong
    * (auth, payload shape, unknown endpoint); never retried.
    */
  final class HttpClientError(status: Int, body: String)
    extends HttpPushError(status, body)

  /** 5xx, 408 (server-side timeout), 429 (throttle): the request is fine,
    * the server is not — exactly what exponential backoff is for.
    */
  final class HttpServerError(status: Int, body: String)
    extends HttpPushError(status, body)

  /** Map a status code onto the taxonomy; 2xx returns unit, anything else
    * raises the class that tells [[withRetry]] whether backoff can help.
    * (raise_for_status analog — reference qradar/qradarconnector.py:90-102.)
    */
  def raiseForStatus(status: Int, body: => String = ""): Unit =
    if (status < 200 || status >= 300) {
      if (status == 408 || status == 429 || (status >= 500 && status < 600))
        throw new HttpServerError(status, body)
      else if (status >= 400 && status < 500)
        throw new HttpClientError(status, body)
      else // 1xx/3xx from a push endpoint: unexpected but not provably fatal
        throw new HttpServerError(status, body)
    }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Exponential-backoff retry (tenacity stop_after_attempt +
    * wait_exponential analog — reference qradar/search_executor.py:13-20):
    * delays base, 2*base, 4*base, ... Rethrows the final failure once
    * `maxAttempts` is exhausted. An [[HttpClientError]] short-circuits —
    * the taxonomy says backoff cannot change a deterministic 4xx outcome.
    */
  def withRetry[T](maxAttempts: Int, baseDelayMs: Long)(attempt: => T): T = {
    var n = 0
    var delay = baseDelayMs
    while (true) {
      try return attempt
      catch {
        case fatal: HttpClientError => throw fatal
        // NonFatal only: an interrupt means Spark is cancelling the task
        // and an Error is JVM-fatal — sleeping and retrying over either
        // would delay the kill by the whole backoff schedule
        case scala.util.control.NonFatal(e) =>
          n += 1
          if (n >= maxAttempts) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Wire a (streaming) DataFrame to the push transport: one gzip payload
    * per non-empty partition per micro-batch. A non-2xx status raises and
    * is retried with backoff; exhausted retries fail the batch so
    * checkpoint recovery replays it (at-least-once).
    */
  def writer(df: DataFrame, transport: Transport,
             maxAttempts: Int = 5, baseDelayMs: Long = 10): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      pushBatch(batch, batchId, transport, maxAttempts, baseDelayMs)
    }

  /** One micro-batch (also directly usable for batch-mode pushes).
    *
    * Lines stream straight through the GZIPOutputStream one at a time, so
    * peak executor memory is the COMPRESSED buffer — never the whole
    * uncompressed partition payload (which for a large partition would be
    * partition-size bytes resident three times over: String, UTF-8 bytes,
    * gzip input).
    */
  def pushBatch(batch: DataFrame, batchId: Long, transport: Transport,
                maxAttempts: Int = 5, baseDelayMs: Long = 10): Unit =
    batch.toJSON.foreachPartition { (it: Iterator[String]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        val nl = "\n".getBytes("UTF-8")
        var first = true
        it.foreach { line =>
          if (!first) gz.write(nl)
          gz.write(line.getBytes("UTF-8"))
          first = false
        }
        gz.close()
        val payload = bos.toByteArray
        withRetry(maxAttempts, baseDelayMs) {
          raiseForStatus(transport(batchId, pid, payload))
        }
      }
    }
}
