package graft.streaming

import graft.SparkFixture
import graft.ops.Temporal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.max
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
  private def fmt(t: Timestamp): String = t.toString.take(19)

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

  test("sessionsStateful: a late-but-within-watermark event extends the session BACKWARD") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Evt]
    val q = Streams.sessionsStateful(in.toDS())
      .writeStream.format("memory").queryName("stateful_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.Evt(1, ts("2024-01-01 09:50:00"), 1.0),
        Streams.Evt(1, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // watermark sits 30 min behind 10:00 → a 09:40 arrival is LATE but
      // admissible; it must extend the session start to 09:40 and must
      // NOT move the frontier back (the close stays 10:00 + gap)
      in.addData(Streams.Evt(1, ts("2024-01-01 09:40:00"), 1.0))
      q.processAllAvailable()
      // a next event 25 min after the real last event CONTINUES the
      // session (the regression closed it: lastTs had slid back to 09:40)
      in.addData(Streams.Evt(1, ts("2024-01-01 10:25:00"), 1.0))
      q.processAllAvailable()
      in.addData(Streams.Evt(9, ts("2024-01-01 20:00:00"), 0.0)) // close all
      q.processAllAvailable()
      val rows = s.table("stateful_late_out")
        .filter($"user_id" === 1L).orderBy("session_start").collect()
        .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3)))
      assert(rows.toSeq ==
        Seq(("2024-01-01 09:40:00.0", "2024-01-01 10:55:00.0", 4L)),
        rows.mkString(", "))
    } finally q.stop()
  }

  test("dedup drops duplicate keys within the watermark window") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.dedup(in.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Ev(1, 1, "click", ts("2024-01-01 10:00:01"), 1.0), // dup key
        Ev(2, 1, "click", ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      in.addData(Ev(2, 1, "click", ts("2024-01-01 10:06:00"), 2.0)) // dup again
      q.processAllAvailable()
      assert(s.table("dedup_out").select("event_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream join: clicks pick up same-user purchases within 10 minutes") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      purchases.addData(
        Ev(10, 1, "purchase", ts("2024-01-01 10:00:00"), 5.0),
        Ev(11, 2, "purchase", ts("2024-01-01 10:00:00"), 7.0))
      clicks.addData(
        Ev(20, 1, "click", ts("2024-01-01 10:05:00"), 0.0), // joins p10
        Ev(21, 1, "click", ts("2024-01-01 10:20:00"), 0.0), // outside 10 min
        Ev(22, 3, "click", ts("2024-01-01 10:02:00"), 0.0)) // no purchase
      q.processAllAvailable()
      val rows = s.table("ssj_out")
        .select("click_id", "purchase_value").as[(Long, Double)]
        .collect().sorted.toSeq
      assert(rows == Seq((20L, 5.0)))
    } finally q.stop()
  }

  test("kappa property: file-stream hourly equals batch hourly for closed windows") {
    val s = spark
    import s.implicits._
    // the real driver testdata as a file stream (ts normalized by the
    // same shared helper Tables uses for batch — nanos-long or NTZ)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    def normalize(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Tables.normalizeTs(df)
    val static = normalize(s.read.parquet(s"$dir/events.parquet"))
    val batch = Streams.hourly(static)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // file sources stream DIRECTORIES; stage the file into one
    val stage = Files.createTempDirectory("kappa_events")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = normalize(
      s.readStream.schema(s.read.parquet(s"$dir/events.parquet").schema)
        .parquet(stage.toString))
    val q = Streams.hourly(stream)
      .writeStream.format("memory").queryName("kappa_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = s.table("kappa_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // append mode emits only watermark-closed windows; every emitted row
      // must be EXACTLY the batch row, and most windows must have closed
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"streaming rows diverge from batch: ${streamed -- batch}")
      val maxTs = static.agg(max($"ts")).collect().head.getTimestamp(0)
      val closed = batch.filter { case (hour, _, _, _) =>
        // window end + 1h watermark delay <= max event time
        hour.getTime + 2 * 3600 * 1000 <= maxTs.getTime
      }
      assert(closed.subsetOf(streamed),
        s"closed windows missing from streaming output: ${closed -- streamed}")
    } finally q.stop()
  }

  test("nearDupIngest: suppresses within-batch and historical near-dups") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_neardup")
    val out = base.resolve("out").toString
    val index = base.resolve("index").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words that share no three gram at all here"
    val in = MemoryStream[(Long, String)]

    def drain(): Unit = {
      val q = Streams.nearDupIngest(in.toDF().toDF("doc_id", "text"),
        out, index, base.resolve("ckpt").toString)
      q.awaitTermination()
    }

    // batch 1: doc 2 duplicates doc 1 within the batch -> only 1 accepted
    in.addData((1L, text), (2L, text))
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L))

    // batch 2: doc 3 duplicates historically-accepted doc 1 -> dropped;
    // doc 4 is novel -> accepted
    in.addData((3L, text), (4L, other))
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 4L))
    // the index only carries keys of accepted docs
    assert(s.read.parquet(index).select("doc_id").distinct().as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))

    // FRESH checkpoint against the same sinks (checkpoint lost / new
    // ingest run): its batch numbering restarts at 0, which must neither
    // overwrite the old run's partitions nor ignore them as history
    val in2 = MemoryStream[(Long, String)]
    in2.addData((5L, text), (6L, "novel fresh content nothing like before okay"))
    val q2 = Streams.nearDupIngest(in2.toDF().toDF("doc_id", "text"),
      out, index, base.resolve("ckpt2").toString)
    q2.awaitTermination()
    // doc 5 near-dups run-1's doc 1 -> dropped; doc 6 accepted;
    // run-1's accepted docs all still present
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 4L, 6L))
  }

  test("decontaminateIngest: drops docs sharing any 4-gram with the eval set") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_decon")
    val out = base.resolve("out").toString
    val evalDocs = Seq("held out eval question about spark windows")
      .toDF("text")
    val evalGrams = Streams.evalGramsOf(evalDocs)
    val in = MemoryStream[(Long, String)]

    def drain(): Unit =
      Streams.decontaminateIngest(in.toDF().toDF("doc_id", "text"),
        evalGrams, out, base.resolve("ckpt").toString).awaitTermination()

    in.addData(
      // contains "eval question about spark" -> contaminated
      (1L, "training doc with the eval question about spark inside it"),
      (2L, "a perfectly clean training document with no overlap whatsoever"),
      (3L, "short doc")) // < 4 tokens of overlap possible, kept
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L))

    // second batch replays the same pipeline against the same output
    in.addData((4L, "another clean one"), (5L, "question about spark windows yes"))
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L, 4L))
  }

  test("surprisalGateIngest: frozen-LM gate matches the batch integer test, OOV scores 0") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_surp")
    val out = base.resolve("out").toString
    // corpus: "a" 8/10 of mass (cppm 800000), "b" 2/10 (cppm 200000)
    val corpus = Seq((1L, "a a a a b"), (2L, "a a a a b")).toDF("doc_id", "text")
    val lm = graft.ops.TextAnalysis.unigramLm(corpus)
    val in = MemoryStream[(Long, String)]

    def drain(): Unit =
      Streams.surprisalGateIngest(in.toDF().toDF("doc_id", "text"),
        lm, 500000L, out, base.resolve("ckpt").toString).awaitTermination()

    in.addData(
      (10L, "a a b"),     // mean (8e5+8e5+2e5)/3 = 600000 ≥ floor → kept
      (11L, "b b a"),     // 400000 < floor → dropped
      (12L, "a a zzz"),   // OOV zzz scores 0: (8e5+8e5+0)/3 = 533333 → kept
      (13L, "zzz qqq"))   // all OOV → 0 → dropped
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(10L, 12L))

    // second batch appends through the same frozen LM
    in.addData((14L, "a a a a"), (15L, "b zzz"))
    drain()
    assert(s.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(10L, 12L, 14L))
  }

  test("componentIngest: streamed label maintenance equals a full batch recompute (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_comp_ingest")
    val labels = base.resolve("labels").toString
    val in = MemoryStream[(Long, Long)]
    def drain(): Unit =
      Streams.componentIngest(in.toDF().toDF("da", "db"),
        labels, base.resolve("ckpt").toString).awaitTermination()
    def current(): Seq[(Long, Long)] = {
      val df = s.read.parquet(labels)
      val top = df.agg(org.apache.spark.sql.functions.max($"seq")).head().getLong(0)
      df.filter($"seq" === top).select("doc_id", "component")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    // batch 1: two separate clusters
    in.addData((2L, 4L), (6L, 8L))
    drain()
    assert(current() == Seq((2L, 2L), (4L, 2L), (6L, 6L), (8L, 6L)))
    // batch 2: a new vertex bridges them, plus an unrelated new pair
    in.addData((4L, 7L), (7L, 6L), (10L, 12L))
    drain()
    val got = current()
    val all = Seq(2L -> 4L, 6L -> 8L, 4L -> 7L, 7L -> 6L, 10L -> 12L)
      .toDF("da", "db")
    val full = graft.ops.GraphOps.components(all).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == full)
    assert(got.filter(_._1 <= 8L).forall(_._2 == 2L)) // merged cluster
    assert(got.find(_._1 == 10L).get._2 == 10L)
  }

  test("bpeFertilityGate: frozen-tokenizer stream decisions equal batch encoding (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // train on an in-domain corpus: (h,e)→(he,l)→… merges make 'hello'
    // cheap; unseen character material stays one piece per char
    val corpus = Seq((1L, "hello hello hello world world"),
      (2L, "hello world hello")).toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeMerges(corpus, 4)
    assert(merges.size == 4)
    val docs = Seq(
      (10L, "hello hello"), // in-domain: few pieces per word
      (11L, "zq xk vj"),    // out-of-domain: one piece per char
      (12L, ""))            // wordless: passes vacuously
    val batch = Streams.bpeFertilityGate(
      docs.toDF("doc_id", "text"), merges, 1500000L)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, String)]
    val q = Streams.bpeFertilityGate(
      in.toDF().toDF("doc_id", "text"), merges, 1500000L)
      .writeStream.format("memory").queryName("bpe_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = s.table("bpe_gate_out").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.exists(r => r.head == 10L && r.last == true))
      // the 4 merges collapse 'hello' to ONE piece (el→ell→ello→hello),
      // so doc 10 scores 1e6 ppm; unseen 2-char words stay 2 pieces/word
      // = 2e6 ppm, over the 1.5e6 gate
      assert(batch.exists(r => r.head == 11L && r.last == false), batch.toString)
      assert(batch.exists(r => r.head == 12L && r.last == true))
    } finally q.stop()
  }

  test("rulesGateIngest: streamed rule flags equal the batch t37 columns (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = Seq(
      (1L, (Seq("the", "a") ++ (1 to 23).map(i => s"word$i")).mkString(" ")),
      (2L, "too short"),
      (3L, (1 to 25).map(i => s"token$i").mkString(" ")))
    val batch = Streams.rulesGateIngest(
      docs.toDF("doc_id", "text")).collect().map(_.toSeq).toSet

    val in = MemoryStream[(Long, String)]
    val q = Streams.rulesGateIngest(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rules_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = s.table("rules_out").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.exists(r => r.head == 1L && r.last == true))
      assert(batch.exists(r => r.head == 2L && r.last == false))
    } finally q.stop()
  }

  test("kAnonGate: frozen class map flags sub-k and unseen classes like batch (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // reference corpus: (en, web, bucket 0) has 3 members; (fr, web, 0) has 1
    val corpus = Seq(
      (1L, "en", "web", 50L), (2L, "en", "web", 120L), (3L, "en", "web", 10L),
      (4L, "fr", "web", 30L)).toDF("doc_id", "lang", "source", "n_chars")
    val classes = graft.ops.TextAnalysis.qiClasses(corpus)

    val arriving = Seq(
      (10L, "en", "web", 80L), // class of 3 → releasable at k=2
      (11L, "fr", "web", 40L), // class of 1 → held back
      (12L, "de", "web", 40L)) // class the corpus never saw → held back
    val expected = Streams.kAnonGate(
      arriving.toDF("doc_id", "lang", "source", "n_chars"), classes, k = 2L)
      .collect().map(_.toSeq).toSet

    val in = MemoryStream[(Long, String, String, Long)]
    val q = Streams.kAnonGate(
      in.toDF().toDF("doc_id", "lang", "source", "n_chars"), classes, k = 2L)
      .writeStream.format("memory").queryName("kanon_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = s.table("kanon_out").collect().map(_.toSeq).toSet
      assert(streamed == expected)
      assert(streamed.exists(r => r.head == 10L && r.last == true))
      assert(streamed.exists(r => r.head == 11L && r.last == false))
      assert(streamed.exists(r => r.head == 12L && r.last == false))
    } finally q.stop()
  }

  test("centroidGate: frozen centroids flag mislabeled vectors like batch (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // two well-separated label clusters in 3 dims
    val corpus = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)), (2L, 0, Seq(0.9f, 0.1f, 0.0f)),
      (3L, 1, Seq(0.0f, 1.0f, 0.0f)), (4L, 1, Seq(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val cents = graft.ops.Similarity.fitCentroids(corpus)
    assert(cents.map(_._1) == Seq(0, 1))

    val arriving = Seq(
      (10L, 0, Seq(0.95f, 0.05f, 0.0f)), // genuinely label 0 → ok
      (11L, 1, Seq(0.9f, 0.0f, 0.1f)),   // claims 1, sits at 0 → flagged
      (12L, 1, Seq(0.0f, 0.95f, 0.0f)),  // genuinely label 1 → ok
      (13L, 7, Seq(0.5f, 0.5f, 0.0f)))   // label the fit never saw → flagged
    val expected = Streams.centroidGate(
      arriving.toDF("vec_id", "label", "embedding"), cents)
      .collect().map(_.toSeq).toSet

    val in = MemoryStream[(Long, Int, Seq[Float])]
    val q = Streams.centroidGate(
      in.toDF().toDF("vec_id", "label", "embedding"), cents)
      .writeStream.format("memory").queryName("centroid_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = s.table("centroid_out").collect().map(_.toSeq).toSet
      assert(streamed == expected)
      assert(streamed.exists(r => r.head == 10L && r.last == true))
      assert(streamed.exists(r => r.head == 11L && r.last == false))
      assert(streamed.exists(r => r.head == 12L && r.last == true))
      // an UNSEEN label must flag false (route to review), never a NULL
      // that vanishes from both the pass and the review filters
      assert(streamed.exists(r => r.head == 13L && r.last == false))
    } finally q.stop()
  }

  test("dsirGate: frozen-weight scores equal the batch fit + dot product (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // train the weights offline on a corpus where 'en' over-represents
    // the word "alpha" and other langs over-represent "omega"
    val corpus = Seq(
      (1L, "alpha alpha beta", "en"),
      (2L, "alpha gamma beta", "en"),
      (3L, "omega omega delta", "zh"),
      (4L, "omega epsilon", "fr")).toDF("doc_id", "text", "lang")
    val w = graft.ops.TextAnalysis.dsirWeights(corpus)
      .orderBy($"bucket").collect().map(_.getLong(1)).toSeq
    assert(w.length == graft.ops.TextAnalysis.HashBuckets)

    val arriving = Seq(
      (10L, "alpha alpha alpha"), // target-like: should score high
      (11L, "omega omega omega")) // raw-like: should score low
    val batch = Streams.dsirGate(
      arriving.toDF("doc_id", "text"), w, minScore = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val scoreHi = batch.find(_._1 == 10L).get._2
    val scoreLo = batch.find(_._1 == 11L).get._2
    assert(scoreHi > scoreLo, s"target-like $scoreHi !> raw-like $scoreLo")

    // threshold between the two scores splits keeps deterministically;
    // the streamed decisions must be bit-identical to batch
    val cut = scoreLo + (scoreHi - scoreLo) / 2
    val expected = Streams.dsirGate(arriving.toDF("doc_id", "text"), w, cut)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, String)]
    val q = Streams.dsirGate(in.toDF().toDF("doc_id", "text"), w, cut)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = s.table("dsir_out").collect().map(_.toSeq).toSet
      assert(streamed == expected)
      assert(streamed.exists(r => r.head == 10L && r.last == true))
      assert(streamed.exists(r => r.head == 11L && r.last == false))
    } finally q.stop()
  }

  test("cmsIngest: closed-prefix sketch cells are bit-identical to the batch CMS (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val batch1 = Seq((1L, "alpha beta alpha"), (2L, "gamma beta"))
    val batch2 = Seq((3L, "alpha delta delta epsilon"), (4L, "beta"))
    val in = MemoryStream[(Long, String)]
    val q = Streams.cmsIngest(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      // prefix 1: live cells == batch rebuild over batch1 alone
      val exp1 = graft.ops.TextAnalysis.cmsCells(
        batch1.toDF("doc_id", "text")
          .selectExpr("explode(split(text, ' ')) as w"))
        .collect().map(_.toSeq).toSet
      assert(s.table("cms_out").collect().map(_.toSeq).toSet == exp1)
      in.addData(batch2: _*)
      q.processAllAvailable()
      // prefix 2: cells fold, never reset — == batch rebuild over ALL rows
      val exp2 = graft.ops.TextAnalysis.cmsCells(
        (batch1 ++ batch2).toDF("doc_id", "text")
          .selectExpr("explode(split(text, ' ')) as w"))
        .collect().map(_.toSeq).toSet
      val live = s.table("cms_out").collect().map(_.toSeq).toSet
      assert(live == exp2)
      // the state bound: never more cells than the sketch geometry allows
      assert(live.size <= graft.ops.TextAnalysis.CmsRows *
        graft.ops.TextAnalysis.CmsWidth)
    } finally q.stop()
  }

  test("nbGate: frozen-model predictions equal batch t51 classify (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // train offline: 'en' dominated by "alpha", 'zh' by "omega"
    val corpus = Seq(
      (1L, "alpha alpha beta", "en"),
      (2L, "alpha gamma", "en"),
      (3L, "omega omega delta", "zh"),
      (4L, "omega epsilon", "zh")).toDF("doc_id", "text", "lang")
    val model = graft.ops.TextAnalysis.nbModel(corpus)
    assert(model.map(_._1) == Seq("en", "zh"))
    assert(model.forall(_._3.length == graft.ops.TextAnalysis.HashBuckets))

    val arriving = Seq(
      (10L, "alpha alpha alpha", "en"),  // consistent label
      (11L, "omega omega", "en"),        // mislabeled → review
      (12L, "omega delta", "zh"))
    val expected = Streams.nbGate(
      arriving.toDF("doc_id", "text", "lang"), model)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.nbGate(in.toDF().toDF("doc_id", "text", "lang"), model)
      .writeStream.format("memory").queryName("nb_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = s.table("nb_out").collect().map(_.toSeq).toSet
      assert(streamed == expected)
      val byId = streamed.map(r => r.head.asInstanceOf[Long] -> r).toMap
      assert(byId(10L)(2) == "en" && byId(10L)(4) == true)
      assert(byId(11L)(2) == "zh" && byId(11L)(4) == false) // quarantined
      assert(byId(12L)(2) == "zh" && byId(12L)(4) == true)
    } finally q.stop()
  }

  test("nbCountsIngest: a model derived from streamed statistics equals the batch fit (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val B = graft.ops.TextAnalysis.HashBuckets
    val batch1 = Seq((1L, "alpha alpha beta", "en"), (2L, "omega delta", "zh"))
    val batch2 = Seq((3L, "alpha gamma", "en"), (4L, "omega omega", "zh"),
      (5L, "alpha omega", "fr"))
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.nbCountsIngest(in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("nbcounts_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // last emission per lang = the closed-prefix sufficient statistics
      val last = s.table("nbcounts_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3)))
        .zipWithIndex.groupBy(_._1._1)
        .map { case (l, rows) => l -> rows.maxBy(_._2)._1 }
      // derive the add-one ppm table exactly as nbModel does
      val nTotal = last.values.map(_._2).sum
      val nLangs = last.size
      val derived = last.toSeq.sortBy(_._1).map { case (l, (_, nd, tl, cb)) =>
        (l,
          (BigInt(nd + 1) * 1000000 / (nTotal + nLangs)).toLong,
          cb.map(c => (BigInt(c + 1) * 1000000 / (tl + B)).toLong))
      }
      val expected = graft.ops.TextAnalysis.nbModel(
        (batch1 ++ batch2).toDF("doc_id", "text", "lang"))
      assert(derived == expected,
        "streamed statistics must reproduce the batch-trained model exactly")
    } finally q.stop()
  }

  test("trendingNgrams: windowed trigram counts emit when the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.trendingNgrams(in.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("trending_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), "spark is fast spark is fast"),
        (ts("2024-01-01 10:20:00"), "spark is fast"))
      q.processAllAvailable()
      // watermark sentinel far ahead closes the 10:00 window
      in.addData((ts("2024-01-01 20:00:00"), "closing sentinel text here"))
      q.processAllAvailable()
      val rows = s.table("trending_out")
        .filter($"window_start" === ts("2024-01-01 10:00:00"))
        .orderBy($"n".desc, $"trigram")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(rows.take(2) == Seq(("spark is fast", 3L), ("fast spark is", 1L)))
    } finally q.stop()
  }

  test("scrubIngest: streaming scrub equals the batch expressions (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    final case class Doc(doc_id: Long, text: String)
    val docs = Seq(
      Doc(1L, "mail me at bob@example.com or call 555 1234"),
      Doc(2L, ("the a " * 30).trim), // 60 tokens, all stopwords → not quality
      Doc(3L, (Seq.fill(40)("spark word").mkString(" "))), // quality
      Doc(4L, "short doc"),
      Doc(5L, "user123@example.com plus 77")) // digits inside the email
    val in = MemoryStream[(Long, String)]
    val q = Streams.scrubIngest(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scrub_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs.map(d => (d.doc_id, d.text)): _*)
      q.processAllAvailable()
      val streamRows = s.table("scrub_out").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      // the batch twin: identical Column expressions over a static frame
      val batchRows = Streams.scrubIngest(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      assert(streamRows.toSeq == batchRows.toSeq)
      val byId = streamRows.map(t => t._1 -> t).toMap
      assert(byId(1L)._2 == "mail me at <EMAIL> or call <NUM> <NUM>")
      assert(byId(1L)._3 == 3L) // one email + two digit runs
      assert(!byId(2L)._5, "all-stopword doc must fail the quality gate")
      assert(byId(3L)._5, "long mixed doc must pass the quality gate")
      assert(!byId(4L)._5, "2-token doc is below the length gate")
      // the 123 inside the email is masked by the ONE email replacement —
      // counted once, not double-counted as a separate digit run
      assert(byId(5L)._2 == "<EMAIL> plus <NUM>")
      assert(byId(5L)._3 == 2L, s"email+digit count, got ${byId(5L)._3}")
    } finally q.stop()
  }

  test("vocabSketch: streamed estimate converges to the batch KMV (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val K = 8
    // JVM-side mirror of tokenHash48 (first 12 hex chars of md5)
    def hash48(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    def expectedEst(tokens: Seq[String]): Double = {
      val mins = tokens.map(hash48).distinct.sorted.take(K)
      if (mins.length < K) mins.length.toDouble
      else ((K - 1).toLong * graft.ops.TextAnalysis.KmvRange48).toDouble / mins.last
    }
    val batch1 = Seq(("web", "alpha beta gamma delta epsilon zeta"),
      ("web", "eta theta iota kappa"), ("book", "one two"))
    val batch2 = Seq(("web", "lambda mu nu xi omicron pi rho sigma tau"),
      ("book", "three two one"))
    val in = MemoryStream[(String, String)]
    val q = Streams.vocabSketch(in.toDS().toDF("source", "text"), K)
      .writeStream.format("memory").queryName("vocab_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // last emission per source must equal the brute KMV over ALL rows
      // — folding per-batch state equals sketching the union
      val last = s.table("vocab_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .zipWithIndex.groupBy(_._1._1).map { case (src, rows) =>
          src -> rows.maxBy(_._2)._1
        }
      val webTokens = (batch1 ++ batch2).filter(_._1 == "web")
        .flatMap(_._2.split(" ")).toSeq
      val bookTokens = (batch1 ++ batch2).filter(_._1 == "book")
        .flatMap(_._2.split(" ")).toSeq
      // web has 19 distinct tokens > K → estimator branch; book has 3 → exact
      assert(last("web")._2 == K.toLong)
      assert(last("web")._3 == expectedEst(webTokens))
      assert(last("book") == (("book", 3L, 3.0)))
      // update mode re-emits web each batch: 2 rows for web over time
      assert(s.table("vocab_out").filter($"source" === "web").count() == 2L)
    } finally q.stop()
  }

  test("latestState: per-key snapshot survives out-of-order and replayed events") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.latestState(in.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        Streams.Ev2(1, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Streams.Ev2(2, 1, "click", ts("2024-01-01 11:00:00"), 2.0),
        Streams.Ev2(3, 2, "view", ts("2024-01-01 10:30:00"), 3.0))
      q.processAllAvailable()
      // batch 2: a LATE event (older ts) must not displace the snapshot,
      // a replay of event 2 must be a no-op, and a genuinely newer event
      // must win; user 2 gets no data → no re-emit for it this batch
      in.addData(
        Streams.Ev2(4, 1, "click", ts("2024-01-01 09:00:00"), 9.0),
        Streams.Ev2(2, 1, "click", ts("2024-01-01 11:00:00"), 2.0),
        Streams.Ev2(5, 1, "click", ts("2024-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      val emitted = s.table("latest_out")
        .select($"user_id", $"event_type", $"event_id", $"value")
        .as[(Long, String, Long, Double)].collect().toSeq
      // update mode: one snapshot per touched key per batch
      assert(emitted.count { case (u, t, _, _) => u == 1 && t == "click" } == 2)
      assert(emitted.count { case (u, t, _, _) => u == 2 && t == "view" } == 1)
      // batch-1 snapshot for (1, click) was event 2; batch-2 is event 5
      assert(emitted.contains((1L, "click", 2L, 2.0)))
      assert(emitted.contains((1L, "click", 5L, 5.0)))
      assert(emitted.contains((2L, "view", 3L, 3.0)))
      // the final snapshot matches the batch q39 struct-max over the
      // union of everything that arrived (the kappa property)
      val last = emitted.filter { case (u, t, _, _) => u == 1 && t == "click" }.last
      assert(last == ((1L, "click", 5L, 5.0)))
    } finally q.stop()
  }

  test("conversionIngest: per-user funnel state machine matches q23 stage rules") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.conversionIngest(in.toDS())
      .writeStream.format("memory").queryName("conv_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        // user 1: full funnel, delivered out of order within the batch
        Streams.Ev2(2, 1, "click", ts("2024-01-01 12:00:00"), 0.0),
        Streams.Ev2(1, 1, "signup", ts("2024-01-01 10:00:00"), 0.0),
        // user 2: signup only; the click is 49h later → stage 1 never fires
        Streams.Ev2(3, 2, "signup", ts("2024-01-01 10:00:00"), 0.0),
        Streams.Ev2(4, 2, "click", ts("2024-01-03 11:00:00"), 0.0),
        // user 3: purchase BEFORE any click → ignored
        Streams.Ev2(5, 3, "signup", ts("2024-01-01 10:00:00"), 0.0),
        Streams.Ev2(6, 3, "purchase", ts("2024-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      // second batch: user 1 purchases within 48h of the click; a second
      // signup for user 1 is ignored (first-completion only)
      in.addData(
        Streams.Ev2(7, 1, "signup", ts("2024-01-02 09:00:00"), 0.0),
        Streams.Ev2(8, 1, "purchase", ts("2024-01-02 10:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("conv_out").as[Streams.StageHit]
        .collect().toSeq.sortBy(h => (h.user_id, h.stage))
      assert(rows.map(h => (h.user_id, h.stage)) ==
        Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0), (3L, 0)))
      // stage totals ARE the live funnel: 3 signups, 1 click, 1 purchase
      assert(rows.groupBy(_.stage).view.mapValues(_.size).toMap ==
        Map(0 -> 3, 1 -> 1, 2 -> 1))
    } finally q.stop()
  }

  test("firstSeen: each user emits once, on their earliest event in the batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.firstSeen(in.toDS())
      .writeStream.format("memory").queryName("first_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.Ev2(2, 1, "click", ts("2024-01-01 11:00:00"), 1.0),
        Streams.Ev2(1, 1, "click", ts("2024-01-01 10:00:00"), 1.0),
        Streams.Ev2(3, 2, "view", ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // replay of user 1 plus a new user: only user 3 emits
      in.addData(
        Streams.Ev2(4, 1, "click", ts("2024-01-02 09:00:00"), 1.0),
        Streams.Ev2(5, 3, "click", ts("2024-01-02 10:00:00"), 1.0))
      q.processAllAvailable()
      val rows = s.table("first_out")
        .as[(Long, Timestamp)].collect().toSeq.sortBy(_._1)
      assert(rows == Seq(
        (1L, ts("2024-01-01 10:00:00")), // earliest of the batch, not first-arrived
        (2L, ts("2024-01-01 12:00:00")),
        (3L, ts("2024-01-02 10:00:00"))))
    } finally q.stop()
  }

  test("activeWindows: closed sliding windows match batch q41's counts") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.activeWindows(in.toDF())
      .writeStream.format("memory").queryName("active_out")
      .outputMode(OutputMode.Append).start()
    try {
      // u1 active Jan 1 (twice: dedup must collapse); u2 active Jan 3
      in.addData(
        Ev(1, 1, "click", ts("2024-01-01 10:00:00"), 0.0),
        Ev(2, 1, "view", ts("2024-01-01 11:00:00"), 0.0),
        Ev(3, 2, "click", ts("2024-01-03 09:00:00"), 0.0))
      q.processAllAvailable()
      // sentinel far in the future closes every window through Jan 9
      in.addData(Ev(99, 9, "click", ts("2024-02-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("active_out")
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
      // batch q41 on the same events (sentinel included, curve clipped
      // at the sentinel's day) — compare the overlapping day range
      val batch = graft.ops.Temporal.rollingActive(
        Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
          (2L, "2024-01-03 09:00:00"), (9L, "2024-02-01 00:00:00"))
          .toDF("user_id", "t")
          .select($"user_id",
            org.apache.spark.sql.functions.to_timestamp($"t").as("ts")))
        .as[(String, Long)].collect().toMap
      // every closed streaming window agrees with the batch curve
      assert(rows.nonEmpty)
      rows.foreach { case (day, n) =>
        assert(batch.get(day).contains(n), s"day $day: stream $n vs batch ${batch.get(day)}")
      }
      // the u1→u1+u2 handoff days all closed and landed
      assert(rows.toMap.get("2024-01-01").contains(1L))
      assert(rows.toMap.get("2024-01-03").contains(2L))
      assert(rows.toMap.get("2024-01-07").contains(2L))
      assert(rows.toMap.get("2024-01-09").contains(1L)) // u1 expired, u2 alive
    } finally q.stop()
  }

  test("scdIngest: closed intervals match batch q42; open runs stay in state") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.scdIngest(in.toDS())
      .writeStream.format("memory").queryName("scd_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 arrives OUT of order within the batch: the fold must sort
      in.addData(
        Streams.Ev2(2, 1, "view", ts("2024-01-01 11:00:00"), 0.0),
        Streams.Ev2(1, 1, "view", ts("2024-01-01 10:00:00"), 0.0),
        Streams.Ev2(3, 1, "buy", ts("2024-01-02 09:00:00"), 0.0))
      q.processAllAvailable()
      // batch 2: a late event (older than the open run's frontier) is
      // dropped; a state change closes the buy run; user 2 opens a run
      in.addData(
        Streams.Ev2(9, 1, "view", ts("2024-01-01 12:00:00"), 0.0), // late
        Streams.Ev2(4, 1, "view", ts("2024-01-03 08:00:00"), 0.0),
        Streams.Ev2(5, 2, "click", ts("2024-01-03 09:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("scd_out")
        .as[Streams.ScdInterval].collect().toSeq
        .sortBy(r => (r.user_id, r.run_id))
        .map(r => (r.user_id, r.run_id, r.state,
          fmt(r.valid_from), fmt(r.valid_to), r.n_events))
      // closed intervals only: u1's view run (2 events) closed by buy,
      // then the buy run closed by the batch-2 view; u1's open view run
      // and u2's open click run are unemitted state
      assert(rows == Seq(
        (1L, 1L, "view", "2024-01-01 10:00:00", "2024-01-02 09:00:00", 2L),
        (1L, 2L, "buy", "2024-01-02 09:00:00", "2024-01-03 08:00:00", 1L)))
      // kappa: the closed prefix equals batch q42 on the same in-order
      // event set (late event 9 excluded), minus its open intervals
      val batchRows = graft.ops.Temporal.scd2Intervals(
        Seq(
          (1L, "view", 1L, ts("2024-01-01 10:00:00")),
          (1L, "view", 2L, ts("2024-01-01 11:00:00")),
          (1L, "buy", 3L, ts("2024-01-02 09:00:00")),
          (1L, "view", 4L, ts("2024-01-03 08:00:00")),
          (2L, "click", 5L, ts("2024-01-03 09:00:00")))
          .toDF("user_id", "event_type", "event_id", "ts"))
        .filter($"valid_to" =!= "open")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3).take(19), r.getString(4).take(19), r.getLong(5)))
        .toSeq
      assert(rows == batchRows)
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

  test("incrementalMerge recovers a crash between target delete and tmp rename") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dir = Files.createTempDirectory("graft_stream_rec").toString
    val target = s"$dir/target"
    val ckpt1 = s"$dir/ckpt1"
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    Streams.incrementalMerge(in.toDF().toDF("id", "payload"), target, ckpt1, "id")
      .awaitTermination()
    // simulate the crash window: the merged state sits complete in __tmp
    // and the target has been deleted
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(s.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(target),
      new org.apache.hadoop.fs.Path(target + "__tmp")))
    in.addData((3L, "c"))
    Streams.incrementalMerge(in.toDF().toDF("id", "payload"), target,
      s"$dir/ckpt2", "id").awaitTermination()
    // history from the recovered tmp survived the merge
    val out = s.read.parquet(target).as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("anomalyIngest: a far-future timestamp fails the batch loudly") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.anomalyIngest(in.toDS())
      .writeStream.format("memory").queryName("anom_poison")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_anom_poison").toString)
      .start()
    try {
      in.addData(Streams.Ev2(1L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // ~year 9999: would zero-fill ~70M hours and poison the frontier
      in.addData(Streams.Ev2(2L, 1L, "click", ts("9999-01-01 10:00:00"), 1.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        { q.processAllAvailable(); q.awaitTermination(10000) })
      def hasGuard(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("corrupt timestamp")) ||
          hasGuard(t.getCause))
      assert(hasGuard(e), s"expected the MaxFillHours guard, got $e")
    } finally q.stop()
  }

  test("funnelIngest: summed counters equal the batch funnel stages (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_funnel")
    val counters = base.resolve("counters").toString
    val index = base.resolve("index").toString
    val evalGrams = Streams.evalGramsOf(
      Seq("held out eval question about spark windows").toDF("text"))
    val in = MemoryStream[(Long, String, String)]

    def drain(ckpt: String): Unit =
      Streams.funnelIngest(in.toDF().toDF("doc_id", "source", "text"),
        evalGrams, counters, index, base.resolve(ckpt).toString)
        .awaitTermination()

    def summed(): Map[String, (Long, Long, Long)] =
      s.read.parquet(counters)
        .groupBy($"source")
        .agg(org.apache.spark.sql.functions.sum($"n_docs"),
          org.apache.spark.sql.functions.sum($"n_after_exact"),
          org.apache.spark.sql.functions.sum($"n_clean"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap

    val dup = "same exact text appearing twice in the corpus"
    // batch 1: doc 2 duplicates doc 1 within the batch; doc 3 is
    // contaminated (contains "eval question about spark")
    in.addData(
      (1L, "a", dup),
      (2L, "a", dup),
      (3L, "b", "training doc with the eval question about spark inside it"))
    drain("ckpt")
    assert(summed() == Map("a" -> ((2L, 1L, 1L)), "b" -> ((1L, 1L, 0L))))

    // batch 2: doc 4 duplicates HISTORY (doc 1); doc 5 is clean and novel
    in.addData(
      (4L, "b", dup),
      (5L, "a", "a perfectly clean training document with no overlap at all"))
    drain("ckpt")
    assert(summed() == Map("a" -> ((3L, 2L, 2L)), "b" -> ((2L, 1L, 0L))))

    // fresh checkpoint, same sinks: batch ids restart at 0 but must not
    // clobber the earlier run's partitions; history still counts
    val in2 = MemoryStream[(Long, String, String)]
    in2.addData((6L, "b", dup))
    Streams.funnelIngest(in2.toDF().toDF("doc_id", "source", "text"),
      evalGrams, counters, index, base.resolve("ckpt2").toString)
      .awaitTermination()
    assert(summed() == Map("a" -> ((3L, 2L, 2L)), "b" -> ((3L, 1L, 0L))))
  }

  test("funnelIngest: a pre-binary (hex string) index fails loudly, not silently readmits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = Files.createTempDirectory("graft_funnel_fmt")
    // an index written by the old hex-string format: same layout, h: string
    Seq(("d41d8cd98f00b204e9800998ecf8427e", "legacy", 0L))
      .toDF("h", "run_id", "batch_id")
      .write.partitionBy("run_id", "batch_id")
      .parquet(base.resolve("index").toString)
    val evalGrams = Streams.evalGramsOf(Seq("held out eval").toDF("text"))
    val in = MemoryStream[(Long, String, String)]
    in.addData((1L, "a", "some doc"))
    val q = Streams.funnelIngest(in.toDF().toDF("doc_id", "source", "text"),
      evalGrams, base.resolve("counters").toString,
      base.resolve("index").toString, base.resolve("ckpt").toString)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        { q.processAllAvailable(); q.awaitTermination(10000) })
      def hasGuard(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("binary digests")) ||
          hasGuard(t.getCause))
      assert(hasGuard(e), s"expected the index-format guard, got $e")
    } finally q.stop()
  }

  test("anomalyIngest: scored closed hours match batch q43 (kappa)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // 24 alternating 9/11 baseline hours, a 30-event burst hour, then a
    // single sentinel event that closes the burst hour
    val counts =
      (0 until 24).map(h => if (h % 2 == 0) 9 else 11) ++ Seq(30, 10, 12, 1)
    var eid = 0L
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map { i =>
        eid += 1
        Streams.Ev2(eid, i.toLong,
          "click", ts(f"2024-05-${1 + h / 24}%02d ${h % 24}%02d:${i % 60}%02d:00"), 1.0)
      }
    }
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.anomalyIngest(in.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split across micro-batches on an hour boundary (event-time order
      // holds across batches — the fold's frontier assumption)
      val (b1, b2) = events.splitAt(events.length / 2)
      in.addData(b1); q.processAllAvailable()
      // a late event older than the open hour must be dropped, not folded
      in.addData(Streams.Ev2(99999L, 1L, "click", ts("2024-05-01 00:30:00"), 1.0))
      q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = s.table("anomaly_out")
        .as[Streams.HourScore].collect()
        .filter(_.mean_cnt.isDefined)
        .map(h => (h.hour, h.cnt, h.mean_cnt.get, h.z, h.is_spike)).toSeq.sorted
      // batch twin over the same events; the sentinel's own hour is still
      // open in the stream, so compare on the closed prefix
      val batch = Temporal.hourlyAnomaly(
        events.toDF().select($"ts"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
        .toSeq.sorted
      // hours 24 (burst), 25, 26 closed with a full baseline; the
      // sentinel's hour 27 is still open in the stream
      assert(got.size == 3 && got == batch.filter(_._1 < "2024-05-02 03"))
      // the burst hour is a confirmed spike in both engines
      val burst = got.find(_._1 == "2024-05-02 00:00:00").get
      assert(burst._2 == 30L && burst._4.exists(_ > 3.0) && burst._5 == 1L)
    } finally q.stop()
  }

  test("anomalyIngest: the 24-hour ring survives a checkpointed restart") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = Files.createTempDirectory("anomaly_ckpt").toString
    val counts = (0 until 24).map(h => if (h % 2 == 0) 9 else 11) ++ Seq(30, 1)
    var eid = 0L
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map { i =>
        eid += 1
        Streams.Ev2(eid, i.toLong, "click",
          ts(f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:${i % 60}%02d:00"), 1.0)
      }
    }
    val in = MemoryStream[Streams.Ev2]
    // memory sinks can't recover a checkpoint; a file sink pins the real
    // production shape (append-only parquet scores)
    val out = Files.createTempDirectory("anomaly_out").toString
    def start() = Streams.anomalyIngest(in.toDS())
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // run 1: everything but the burst and sentinel, then STOP — the ring
    // (23 closed hours) exists only in the state store at this point
    val (beforeBurst, rest) = events.partition(_.ts.getTime <
      ts("2024-05-31 23:00:00").getTime + 86400000L) // hours 0..22
    val q1 = start()
    try { in.addData(beforeBurst); q1.processAllAvailable() } finally q1.stop()
    // run 2: recovered from the checkpoint; the burst must be scored
    // against the PRE-RESTART baseline
    val q2 = start()
    try {
      in.addData(rest)
      q2.processAllAvailable()
      val scored = s.read.parquet(out)
        .as[Streams.HourScore].collect().filter(_.mean_cnt.isDefined)
      assert(scored.length == 1, s"expected one scored hour, got ${scored.toSeq}")
      val b = scored.head
      assert(b.hour == "2024-06-02 00:00:00" && b.cnt == 30L &&
        b.z.exists(_ > 3.0) && b.is_spike == 1L)
    } finally q2.stop()
  }

  test("transitionIngest: emitted pairs equal batch q49's lead pairs; late events drop") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.transitionIngest(in.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 arrives OUT of order within the batch: the fold must sort.
      // u1: view(0s) → click(1s) → buy(3s); a ts TIE (ids 3,4) still
      // transitions in event_id order.
      in.addData(
        Streams.Ev2(2, 1, "click", ts("2024-05-01 00:00:01"), 0.0),
        Streams.Ev2(1, 1, "view", ts("2024-05-01 00:00:00"), 0.0),
        Streams.Ev2(4, 1, "buy", ts("2024-05-01 00:00:03"), 0.0),
        Streams.Ev2(3, 1, "click", ts("2024-05-01 00:00:03"), 0.0))
      q.processAllAvailable()
      // batch 2: a transition ACROSS the micro-batch boundary (buy →
      // view); a late event behind the frontier drops; u2's lone event
      // emits nothing
      in.addData(
        Streams.Ev2(5, 1, "view", ts("2024-05-01 00:00:10"), 0.0),
        Streams.Ev2(9, 1, "click", ts("2024-05-01 00:00:02"), 0.0), // late
        Streams.Ev2(7, 2, "view", ts("2024-05-01 00:00:30"), 0.0))
      q.processAllAvailable()
      val got = s.table("trans_out").as[Streams.TransObs].collect().toSeq
        .map(t => (t.user_id, t.from_type, t.to_type)).sorted
      assert(got == Seq(
        (1L, "buy", "view"), (1L, "click", "buy"),
        (1L, "click", "click"), (1L, "view", "click")))
      // kappa: the same in-order event set (late id 9 excluded) through
      // batch q49's kernel yields the matrix of exactly these pairs
      val batch = graft.ops.Temporal.transitionMatrix(
        Seq(
          (1L, 1L, "view", ts("2024-05-01 00:00:00")),
          (2L, 1L, "click", ts("2024-05-01 00:00:01")),
          (3L, 1L, "click", ts("2024-05-01 00:00:03")),
          (4L, 1L, "buy", ts("2024-05-01 00:00:03")),
          (5L, 1L, "view", ts("2024-05-01 00:00:10")),
          (7L, 2L, "view", ts("2024-05-01 00:00:30")))
          .toDF("event_id", "user_id", "event_type", "ts"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(batch == Seq(
        ("buy", "view", 1L, 1000000L),
        ("click", "buy", 1L, 500000L),
        ("click", "click", 1L, 500000L),
        ("view", "click", 1L, 1000000L)))
    } finally q.stop()
  }

  test("gapIngest: emitted gaps equal batch q46's lag gaps; late events drop") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Streams.Ev2]
    val q = Streams.gapIngest(in.toDS())
      .writeStream.format("memory").queryName("gap_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 arrives OUT of order within the batch: the fold must sort.
      // u1 click at 0s/1s/3s; a ts TIE (ids 3,4) must emit a 0s gap.
      in.addData(
        Streams.Ev2(2, 1, "click", ts("2024-05-01 00:00:01"), 0.0),
        Streams.Ev2(1, 1, "click", ts("2024-05-01 00:00:00"), 0.0),
        Streams.Ev2(4, 1, "click", ts("2024-05-01 00:00:03"), 0.0),
        Streams.Ev2(3, 1, "click", ts("2024-05-01 00:00:03"), 0.0))
      q.processAllAvailable()
      // batch 2: a gap ACROSS the micro-batch boundary (3s → 10s = 7s);
      // a sub-second gap floors to 0; a late event behind the frontier
      // drops; u2's lone view emits nothing
      in.addData(
        Streams.Ev2(5, 1, "click", ts("2024-05-01 00:00:10"), 0.0),
        Streams.Ev2(6, 1, "click", ts("2024-05-01 00:00:10.4"), 0.0),
        Streams.Ev2(9, 1, "click", ts("2024-05-01 00:00:02"), 0.0), // late
        Streams.Ev2(7, 2, "view", ts("2024-05-01 00:00:30"), 0.0))
      q.processAllAvailable()
      val got = s.table("gap_out").as[Streams.GapObs].collect().toSeq
        .map(g => (g.user_id, g.event_type, g.gap_s)).sorted
      assert(got == Seq(
        (1L, "click", 0L), (1L, "click", 0L), (1L, "click", 1L),
        (1L, "click", 2L), (1L, "click", 7L)))
      // kappa: the same in-order event set (late id 9 excluded) through
      // batch q46's kernel yields the profile of exactly these gaps
      val batch = graft.ops.Temporal.gapProfile(
        Seq(
          (1L, 1L, "click", ts("2024-05-01 00:00:00")),
          (2L, 1L, "click", ts("2024-05-01 00:00:01")),
          (3L, 1L, "click", ts("2024-05-01 00:00:03")),
          (4L, 1L, "click", ts("2024-05-01 00:00:03")),
          (5L, 1L, "click", ts("2024-05-01 00:00:10")),
          (6L, 1L, "click", ts("2024-05-01 00:00:10.4")),
          (7L, 2L, "view", ts("2024-05-01 00:00:30")))
          .toDF("event_id", "user_id", "event_type", "ts"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      // gaps 0,0,1,2,7 → p50=1, p90=7, max=7, mean=2
      assert(batch == Seq(("click", 5L, 1L, 7L, 7L, 2L)))
    } finally q.stop()
  }
}
