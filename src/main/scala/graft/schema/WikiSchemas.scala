package graft.schema

import org.apache.spark.sql.types._

/** The reference's one schema that matters (SURVEY.md §1.2): the Wikimedia
  * RecentChange event as projected by the producer
  * (`kafka/wiki-producer.py:81-90`), plus the curated extension columns
  * (`glue/job_wiki_curate.py:35-41`).
  *
  * The reference infers schemas three ways (Spark JSON inference, Glue
  * crawler, MSCK — SURVEY.md §1.3); our engine defines them explicitly
  * (streaming reads require one anyway) and keeps inference as a parity
  * mode (`scan_json_infer`).
  */
object WikiSchemas {

  /** Producer projection: the 8 wire fields. */
  val raw: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("user", StringType),
    StructField("bot", BooleanType),
    StructField("timestamp", LongType),    // epoch seconds
    StructField("comment", StringType),
    StructField("minor", BooleanType)
  ))

  /** Curated: raw + event-time ts + calendar partition columns. */
  val curated: StructType = StructType(raw.fields ++ Seq(
    StructField("ts", TimestampType),
    StructField("yyyy", IntegerType),
    StructField("mm", IntegerType),
    StructField("dd", IntegerType)
  ))
}

/** Typed row for the curate path (fixed small schema ⇒ Dataset[WikiEvent]
  * is worth the compile-time field checks; `type` is a Scala keyword, so
  * the column maps through `eventType`). */
case class WikiEvent(
    id: Option[Long],
    eventType: String,
    title: String,
    user: String,
    bot: Option[Boolean],
    timestamp: Long,
    comment: String,
    minor: Boolean)
