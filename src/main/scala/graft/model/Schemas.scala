package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import graft.sources.Tables

/** Typed core of the data model (SURVEY §1.3): the fixed-schema `Event`
  * gets a case-class `Encoder` for type-safe Dataset transforms; everything
  * dynamic (QRadar custom properties, ragged JSON) stays `DataFrame` with
  * schema-on-read. `props` carries the reference's custom-property payload
  * as a JSON string (SURVEY §1.3 note on scalar custom properties).
  */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

object Schemas {
  implicit val eventEncoder: Encoder[Event] = Encoders.product[Event]

  /** The events table as a typed Dataset. */
  def events(spark: SparkSession, dir: String): Dataset[Event] =
    Tables.events(spark, dir).as[Event](eventEncoder)
}
