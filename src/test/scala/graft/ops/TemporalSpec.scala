package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Cohort-retention math (q35's kernel) on hand-built event streams:
  * ISO-week cohorting, offset arithmetic, within-week dedup, and the
  * offset cutoff. */
class TemporalSpec extends AnyFunSuite with SparkFixture {

  /** (user, ts-string) rows → retention matrix keyed (cohort, offset). */
  private def run(events: Seq[(Long, String)]): Map[(String, Long), (Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val df = events.toDF("user_id", "t")
      .select($"user_id", to_timestamp($"t").as("ts"))
    Temporal.cohortRetention(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("cohorts form on the first-event ISO week; returns land on offsets") {
    // 2024-01-01 is a Monday. u1 starts week 0 and returns weeks 1 and 3;
    // u2 starts week 0, never returns; u3 starts week 1.
    val m = run(Seq(
      1L -> "2024-01-02 10:00:00",
      1L -> "2024-01-09 09:00:00",
      1L -> "2024-01-23 23:00:00",
      2L -> "2024-01-03 12:00:00",
      3L -> "2024-01-10 08:00:00"))
    assert(m == Map(
      ("2024-01-01", 0L) -> ((2L, 2L)),
      ("2024-01-01", 1L) -> ((1L, 2L)),
      ("2024-01-01", 3L) -> ((1L, 2L)),
      ("2024-01-08", 0L) -> ((1L, 1L))))
  }

  test("multiple events in one week count a user once") {
    val m = run(Seq(
      7L -> "2024-02-05 08:00:00",
      7L -> "2024-02-06 09:00:00",
      7L -> "2024-02-07 10:00:00",
      7L -> "2024-02-13 11:00:00"))
    assert(m == Map(
      ("2024-02-05", 0L) -> ((1L, 1L)),
      ("2024-02-05", 1L) -> ((1L, 1L))))
  }

  test("activity past the offset window is cut, not wrapped") {
    val m = run(Seq(
      9L -> "2024-03-04 08:00:00",
      9L -> "2024-04-15 08:00:00")) // 6 weeks later — outside 0..3
    assert(m == Map(("2024-03-04", 0L) -> ((1L, 1L))))
  }

  test("a sunday and the following monday fall in different ISO weeks") {
    val m = run(Seq(
      4L -> "2024-01-07 23:59:59", // Sunday → week of 2024-01-01
      4L -> "2024-01-08 00:00:01")) // Monday → next week, offset 1
    assert(m == Map(
      ("2024-01-01", 0L) -> ((1L, 1L)),
      ("2024-01-01", 1L) -> ((1L, 1L))))
  }

  /** (user, ts-string) rows → (user, start, end, days) streak rows. */
  private def streaksOf(events: Seq[(Long, String)]): Seq[(Long, String, String, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val df = events.toDF("user_id", "t")
      .select($"user_id", to_timestamp($"t").as("ts"))
    Temporal.streaks(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("streaks: islands split on gaps; duplicate days collapse; month edges join") {
    val out = streaksOf(Seq(
      // u1: 3-day run (with a duplicate day), a gap, then a singleton
      1L -> "2024-01-01 10:00:00",
      1L -> "2024-01-02 09:00:00",
      1L -> "2024-01-02 21:00:00",
      1L -> "2024-01-03 08:00:00",
      1L -> "2024-01-05 12:00:00",
      // u2: consecutive across the Jan→Feb month boundary
      2L -> "2024-01-31 23:00:00",
      2L -> "2024-02-01 01:00:00"))
    assert(out == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-31", "2024-02-01", 2L)))
  }

  test("streaks: a leap-day run stays consecutive") {
    val out = streaksOf(Seq(
      3L -> "2024-02-28 10:00:00",
      3L -> "2024-02-29 10:00:00", // 2024 is a leap year
      3L -> "2024-03-01 10:00:00"))
    assert(out == Seq((3L, "2024-02-28", "2024-03-01", 3L)))
  }

  private def toEvents(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    rows.toDF("user_id", "t")
      .select($"user_id", to_timestamp($"t").as("ts"))
  }

  test("rolling 7-day actives: each user-day feeds a week; curve clips at max day") {
    // u1 active Jan 1; u2 active Jan 3. Window 7 days, data ends Jan 3 →
    // report days 1..3 only (no trailing ghost days past the data).
    val out = Temporal.rollingActive(toEvents(Seq(
      1L -> "2024-01-01 10:00:00",
      1L -> "2024-01-01 11:00:00", // same day twice: still one user-day
      2L -> "2024-01-03 09:00:00")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq(
      "2024-01-01" -> 1L,
      "2024-01-02" -> 1L,
      "2024-01-03" -> 2L))
  }

  test("rolling actives: a user expires after 7 days; idle days emit no row") {
    // u1 active day 1 only → visible on report days 1..7.
    // u2 active day 9 → visible on day 9 (curve clips there).
    // Day 8 has no user in its lookback window, so NO row (sparse output).
    val out = Temporal.rollingActive(toEvents(Seq(
      1L -> "2024-01-01 10:00:00",
      2L -> "2024-01-09 10:00:00")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = ((1 to 7) :+ 9).map(d => f"2024-01-$d%02d" -> 1L).toMap
    assert(out == expected)
  }

  /** (user, ts, event_id, state) rows → SCD2 intervals. */
  private def scd2Of(rows: Seq[(Long, String, Long, String)]) = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val df = rows.toDF("user_id", "t", "event_id", "event_type")
      .select($"user_id", $"event_type", $"event_id", to_timestamp($"t").as("ts"))
    Temporal.scd2Intervals(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3).take(19), r.getString(4).take(19), r.getLong(5)))
      .toSeq
  }

  test("scd2: equal-state runs collapse; intervals chain; last stays open") {
    val out = scd2Of(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 11:00:00", 2L, "view"),
      (1L, "2024-01-02 09:00:00", 3L, "buy"),
      (1L, "2024-01-03 08:00:00", 4L, "view")))
    assert(out == Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00", "2024-01-02 09:00:00", 2L),
      (1L, 2L, "buy", "2024-01-02 09:00:00", "2024-01-03 08:00:00", 1L),
      (1L, 3L, "view", "2024-01-03 08:00:00", "open", 1L)))
  }

  test("scd2: same-timestamp ties order by event_id; users are independent") {
    val out = scd2Of(Seq(
      // u5: two events at the SAME ts — event_id 10 (A) then 11 (B)
      (5L, "2024-03-01 12:00:00", 10L, "A"),
      (5L, "2024-03-01 12:00:00", 11L, "B"),
      // u6: single-state log → one open interval
      (6L, "2024-03-02 08:00:00", 20L, "C"),
      (6L, "2024-03-04 08:00:00", 21L, "C")))
    assert(out == Seq(
      (5L, 1L, "A", "2024-03-01 12:00:00", "2024-03-01 12:00:00", 1L),
      (5L, 2L, "B", "2024-03-01 12:00:00", "open", 1L),
      (6L, 1L, "C", "2024-03-02 08:00:00", "open", 2L)))
  }

  /** Per-hour event counts → scored anomaly rows
    * (hour, cnt, mean, z-or-null, spike). */
  private def anomalyOf(countsByHour: Seq[Int]): Seq[(String, Long, Double, Option[Double], Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val rows = countsByHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => f"2024-05-${1 + h / 24}%02d ${h % 24}%02d:${i % 60}%02d:00")
    }
    val df = rows.toDF("t").select(to_timestamp($"t").as("ts"))
    Temporal.hourlyAnomaly(df).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))
    }.toSeq
  }

  test("hourly anomaly: constant baseline has zero variance → null z") {
    val out = anomalyOf(Seq.fill(25)(10))
    assert(out == Seq(("2024-05-02 00:00:00", 10L, 10.0, None, 0L)))
  }

  test("hourly anomaly: a burst against a varying baseline is a spike") {
    // 24 alternating 9/11 hours (mean 10), then a 30-event burst
    val out = anomalyOf((0 until 24).map(h => if (h % 2 == 0) 9 else 11) :+ 30)
    assert(out.length == 1)
    val (hour, cnt, mean, z, spike) = out.head
    assert(hour == "2024-05-02 00:00:00" && cnt == 30L && mean == 10.0)
    assert(z.exists(_ > 3.0) && spike == 1L)
  }

  test("hourly anomaly: silent hours are zero-filled on the spine") {
    // hour 24 has NO events; hour 25 does — the spine keeps hour 24
    // as cnt=0 and scores it as a (negative) anomaly
    val counts = (0 until 24).map(h => if (h % 2 == 0) 9 else 11) ++ Seq(0, 10)
    val out = anomalyOf(counts)
    assert(out.map(o => (o._1, o._2)) == Seq(
      ("2024-05-02 00:00:00", 0L), ("2024-05-02 01:00:00", 10L)))
    val zero = out.head
    assert(zero._4.exists(_ < -3.0) && zero._5 == 1L)
  }

  /** (event_id, user, type, ts-string) rows → q46 profile keyed by type. */
  private def gapsOf(events: Seq[(Long, Long, String, String)])
      : Map[String, (Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val df = events.toDF("event_id", "user_id", "event_type", "t")
      .select($"event_id", $"user_id", $"event_type", to_timestamp($"t").as("ts"))
    Temporal.gapProfile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("event gaps: rank-pick percentiles, max, and floored mean") {
    // one user, one type, gaps 1s / 2s / 7s → p50=2, p90=7, mean=10/3=3
    val m = gapsOf(Seq(
      (1L, 1L, "click", "2024-05-01 00:00:00"),
      (2L, 1L, "click", "2024-05-01 00:00:01"),
      (3L, 1L, "click", "2024-05-01 00:00:03"),
      (4L, 1L, "click", "2024-05-01 00:00:10")))
    assert(m == Map("click" -> ((3L, 2L, 7L, 7L, 3L))))
  }

  test("event gaps: types and users are isolated streams") {
    // u1 alternates click/view 1s apart — within-type gaps are 2s, and
    // u2's lone click contributes no gap at all
    val m = gapsOf(Seq(
      (1L, 1L, "click", "2024-05-01 00:00:00"),
      (2L, 1L, "view",  "2024-05-01 00:00:01"),
      (3L, 1L, "click", "2024-05-01 00:00:02"),
      (4L, 1L, "view",  "2024-05-01 00:00:03"),
      (5L, 2L, "click", "2024-05-01 00:00:04")))
    assert(m == Map(
      "click" -> ((1L, 2L, 2L, 2L, 2L)),
      "view"  -> ((1L, 2L, 2L, 2L, 2L))))
  }

  test("event gaps: ts ties and sub-second gaps floor to zero seconds") {
    val m = gapsOf(Seq(
      (1L, 1L, "ping", "2024-05-01 00:00:00"),
      (2L, 1L, "ping", "2024-05-01 00:00:00"),     // tie → 0s gap
      (3L, 1L, "ping", "2024-05-01 00:00:00.400"), // 400ms → floors to 0
      (4L, 1L, "ping", "2024-05-01 00:00:02")))    // 1.6s → floors to 1
    assert(m == Map("ping" -> ((3L, 0L, 1L, 1L, 0L))))
  }
}
