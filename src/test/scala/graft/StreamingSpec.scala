package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming semantics tests (SURVEY.md §5): T1 micro-batch
  * trigger batching, T4 watermark late-drop, T5 at-least-once dedup, T6
  * stateful sessionization. MemoryStream + processAllAvailable — fully
  * deterministic, no sleeps.
  */
class StreamingSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("T5: duplicate ids within the watermark are dropped (at-least-once -> effectively-once)") {
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val deduped = StreamOps.dedupStream(
      in.toDF.toDF("id", "ts", "title"), "id", "ts", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "A"))
      in.addData((1L, ts("2024-01-01 10:00:00"), "A"))  // redelivery
      in.addData((2L, ts("2024-01-01 10:05:00"), "B"))
      in.addData((1L, ts("2024-01-01 10:06:00"), "A"))  // late redelivery, same id
      q.processAllAvailable()
      val got = spark.table("dedup_out").orderBy("id").collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("T2/T4: event-time daily aggregation; a row later than the watermark is dropped") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val agg = StreamOps.dailyCounts(in.toDF.toDF("ts", "title"), "ts", "title", "1 hour")
    val q = agg.writeStream.format("memory").queryName("daily_out")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 09:00:00"), "A"))
      in.addData((ts("2024-01-01 10:00:00"), "A"))
      q.processAllAvailable()
      // advance watermark far past 2024-01-01: day-1 window closes + emits
      in.addData((ts("2024-01-03 12:00:00"), "B"))
      q.processAllAvailable()
      // this arrives > 1h behind the 2024-01-03 watermark: dropped
      in.addData((ts("2024-01-01 11:00:00"), "A"))
      in.addData((ts("2024-01-05 00:00:00"), "C"))
      q.processAllAvailable()
      val day1 = spark.table("daily_out")
        .filter($"day" === ts("2024-01-01 00:00:00") && $"title" === "A").collect()
      assert(day1.length === 1 && day1.head.getLong(2) === 2L,
        "late row must not re-open the closed day-1 window")
    } finally q.stop()
  }

  test("T1: the raw sink writes date-partitioned gzip NDJSON via micro-batches") {
    val in = MemoryStream[(Long, String)](spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_raw").toString
    val q = StreamOps.rawSink(
        in.toDF.toDF("id", "title"), s"$dir/data", s"$dir/chk",
        triggerInterval = "0 seconds")
      .start()
    try {
      in.addData((1L, "A"), (2L, "B"))
      q.processAllAvailable()
      val files = new java.io.File(s"$dir/data").listFiles()
      val dsDirs = files.filter(f => f.isDirectory && f.getName.startsWith("ds="))
      assert(dsDirs.nonEmpty, "expected ds=YYYY-MM-DD partition dirs")
      val gz = dsDirs.head.listFiles().filter(_.getName.endsWith(".json.gz"))
      assert(gz.nonEmpty, "expected gzip NDJSON part files")
      val back = spark.read.json(s"$dir/data")
      assert(back.count() === 2)
    } finally q.stop()
  }

  test("S3 analog: file-source streaming reads a JSON drop-dir incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val schema = "id LONG, title STRING"
    Seq("""{"id":1,"title":"A"}""", """{"id":2,"title":"B"}""")
      .toDF("value").coalesce(1).write.text(s"$dir/in")
    val stream = spark.readStream.schema(schema).json(s"$dir/in")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("file_src_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_src_out").count() === 2)
      // a new file landing in the dir is picked up as a new micro-batch
      Seq("""{"id":3,"title":"C"}""").toDF("value").coalesce(1)
        .write.mode("append").text(s"$dir/in")
      q.processAllAvailable()
      assert(spark.table("file_src_out").count() === 3)
    } finally q.stop()
  }

  test("T7: restart from checkpoint resumes offsets exactly-once (no re-emission)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    Seq("""{"id":1,"title":"A"}""").toDF("value").coalesce(1).write.text(s"$dir/in")
    def startQuery() = spark.readStream
      .schema("id LONG, title STRING").json(s"$dir/in")
      .writeStream.format("json")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/chk")
      .outputMode("append").start()
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.json(s"$dir/out").count()
    assert(afterFirst === 1)
    // new file lands while the query is DOWN; restart must pick up ONLY it
    Seq("""{"id":2,"title":"B"}""").toDF("value").coalesce(1)
      .write.mode("append").text(s"$dir/in")
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.json(s"$dir/out")
    assert(out.count() === 2, "restart must neither drop nor re-emit")
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("T6: stateful sessionization groups events by inactivity gap") {
    val in = MemoryStream[(Long, Long)](spark)
    val sessions = StreamOps.sessionize(in.toDS(), gapUs = 1800000000L)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    try {
      // user 7: two events 10 min apart (one session), then a 2h gap (new session)
      in.addData((7L, 0L), (7L, 600000000L))
      q.processAllAvailable()
      in.addData((7L, 7800000000L))
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
      val last = out.last
      assert(last.getLong(1) === 1L, "post-gap event starts a fresh session")
      assert(out.head.getLong(1) === 2L, "first two events share a session")
    } finally q.stop()
  }
}
