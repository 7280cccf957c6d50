package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming operators, driven through MemoryStream: windowed
  * aggregation + sessionization close-and-emit on watermark advance, the
  * stateful (flatMapGroupsWithState) sessionizer matches session_window
  * semantics, and foreachBatch incremental merge is key-idempotent. */
class StreamsSpec extends AnyFunSuite with SparkFixture {

  final case class Ev(event_id: Long, user_id: Long, event_type: String,
      ts: Timestamp, value: Double)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourly: append-mode windows emit once the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.hourly(in.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, 1, "click", ts("2024-01-01 10:00:00"), 1.5),
        Ev(2, 1, "click", ts("2024-01-01 10:30:00"), 2.5),
        Ev(3, 2, "view", ts("2024-01-01 11:15:00"), 4.0))
      q.processAllAvailable()
      // sentinel advances the watermark to 19:00 → both earlier windows close
      in.addData(Ev(99, 9, "click", ts("2024-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("hourly_out")
        .orderBy("hour", "event_type")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 4.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("sessions: session_window closes after gap, emits on watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.sessions(in.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Ev(2, 1, "click", ts("2024-01-01 10:10:00"), 2.0),
        Ev(3, 1, "click", ts("2024-01-01 11:30:00"), 4.0))
      q.processAllAvailable()
      in.addData(Ev(99, 9, "click", ts("2024-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("sessions_out")
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0),
        (1L, "2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionsStateful matches session_window semantics incl. timeout emit") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Evt]
    val q = Streams.sessionsStateful(in.toDS())
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.Evt(1, ts("2024-01-01 10:00:00"), 1.0),
        Streams.Evt(1, ts("2024-01-01 10:10:00"), 2.0),
        Streams.Evt(1, ts("2024-01-01 11:30:00"), 4.0))
      q.processAllAvailable()
      // the 11:30 session is still open (held in GroupState); the sentinel
      // advances the watermark past 12:00 and the event-time timeout emits it
      in.addData(Streams.Evt(9, ts("2024-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("stateful_out")
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0),
        (1L, "2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", 1L, 4.0)))
    } finally q.stop()
  }

  test("incrementalMerge: delete-insert by unique key across micro-batch runs") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val target = s"$dir/target"
    val ckpt = s"$dir/ckpt"
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val q1 = Streams.incrementalMerge(
      in.toDF().toDF("id", "payload"), target, ckpt, "id")
    q1.awaitTermination()
    in.addData((2L, "c"), (3L, "d"))
    val q2 = Streams.incrementalMerge(
      in.toDF().toDF("id", "payload"), target, ckpt, "id")
    q2.awaitTermination()
    val out = s.read.parquet(target).as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, "a"), (2L, "c"), (3L, "d")))
  }
}
