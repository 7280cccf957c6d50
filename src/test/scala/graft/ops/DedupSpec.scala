package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The shared inverted-index pair kernel (pairStats) and d09's
  * containment wrapper, pinned on the cases the synthetic corpus lacks:
  * a short doc quoted verbatim inside a long one (containment 1.0,
  * Jaccard ≈ 0), and the stop-shingle df cut that bounds candidate
  * fan-out without perturbing the exact similarity of surviving pairs. */
class DedupSpec extends AnyFunSuite with SparkFixture {

  /** (doc_id, arr) shingle frame from raw (doc_id, text) rows. */
  private def arrs(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.shinglesOfDocs(docs.toDF("doc_id", "text"))
  }

  test("short doc embedded in a long doc: containment 1.0, tagged as contained") {
    // doc 1 = 6 words (4 shingles); doc 2 = doc 1's text surrounded by 24
    // unrelated words — every shingle of 1 appears in 2, so containment
    // is exactly 1.0 while Jaccard is far below the d02 threshold.
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 12).map(i => s"pre$i").mkString(" ")
    val tail = (1 to 12).map(i => s"post$i").mkString(" ")
    val docs = Seq(1L -> quote, 2L -> s"$filler $quote $tail")
    val rows = Dedup.containmentPairs(arrs(docs)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 1L, "the SHORTER doc is the one to drop")
    // the same pair is invisible to the Jaccard gate at 0.5
    val stats = Dedup.pairStats(arrs(docs)).collect().head
    val (i, na, nb) = (stats.getLong(2), stats.getLong(3), stats.getLong(4))
    assert(i.toDouble / (na + nb - i) < 0.5)
  }

  test("d01 counts: exact dups, case/whitespace norm variants, per source") {
    // round 17 pins the multi-distinct rewrite on hand-computed truth:
    // source A holds one exact dup pair plus a case variant of the same
    // text (norm collapses it); source B holds three distinct docs, two
    // of which normalize together via trim.
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_d01").toString
    Seq(
      ("A", "hello world"), ("A", "hello world"), ("A", "Hello World"),
      ("A", "other text"),
      ("B", "one"), ("B", "  one  "), ("B", "two")
    ).toDF("source", "text").write.parquet(s"$tmp/documents.parquet")
    val rows = Dedup.d01(spark, tmp).collect()
    // A: 4 docs, 3 distinct raw (dup pair collapses), 2 distinct norm
    //    ("hello world"/"Hello World" merge), 1 exact dup
    // B: 3 docs, 3 distinct raw, 2 distinct norm ("one"/"  one  " merge)
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ==
      Seq(("A", 4L, 3L, 2L, 1L), ("B", 3L, 3L, 2L, 0L)))
  }

  test("stop-shingle cut drops candidates whose every shared shingle is hot") {
    // three padding docs make "hot hot hot" df=5 > tau=4; docs 10/11
    // share ONLY that shingle, so the pruned index yields no candidate
    val docs = Seq(
      10L -> "hot hot hot a1 a2 a3",
      11L -> "hot hot hot b1 b2 b3",
      20L -> "hot hot hot c1 c2 c3",
      21L -> "hot hot hot d1 d2 d3",
      22L -> "hot hot hot e1 e2 e3")
    val pruned = Dedup.pairStats(arrs(docs), tau = 4L).collect()
    assert(pruned.isEmpty, "hot-only overlap must not survive the cut")
    // with the cut disabled the same pairs come back
    val full = Dedup.pairStats(arrs(docs), tau = 1000L).collect()
    assert(full.length == 10, "all C(5,2) hot-bucket pairs without the cut")
  }

  test("pairStats matches a brute-force reference on random corpora (cut active)") {
    // in-memory model of the same semantics: distinct 3-gram shingle sets,
    // df-pruned space, intersections and sizes over what survives
    def brute(docs: Seq[(Long, String)], tau: Long): Set[(Long, Long, Long, Long, Long)] = {
      val sets = docs.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        if (ws.length >= 3) Some(id -> ws.sliding(3).map(_.mkString(" ")).toSet)
        else None
      }.toMap
      val df = sets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
      val pruned = sets.map { case (id, ss) => id -> ss.filter(s => df(s) <= tau) }
      (for {
        (a, sa) <- pruned.toSeq; (b, sb) <- pruned.toSeq
        if a < b
        i = (sa & sb).size if i > 0
      } yield (a, b, i.toLong, sa.size.toLong, sb.size.toLong)).toSet
    }
    val vocab = Vector("w0", "w1", "w2", "w3", "hot", "dup")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 12L).map { id =>
        id -> Vector.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = Dedup.pairStats(arrs(docs), tau = 2L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == brute(docs, 2L), s"seed $seed diverged from brute force")
    }
  }

  test("bloom probe: every inserted value passes, non-members mostly fail") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.xxhash64
    val members = (1 to 500).map(i => s"gram-$i")
    val bf = members.toDF("g").select(xxhash64($"g").as("h"))
      .stat.bloomFilter("h", 1L << 16, 0.01)
    val bytes = graft.functions.BloomProbe.toBytes(bf)
    val probed = (members ++ (1 to 2000).map(i => s"other-$i")).toDF("g")
      .withColumn("hit", graft.functions.BloomProbe.mightContain(bytes, $"g"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(probed), "a bloom filter must never false-negative")
    val fp = (1 to 2000).count(i => probed(s"other-$i"))
    assert(fp < 100, s"false-positive rate implausibly high ($fp/2000)")
  }

  test("d10 census equals the exact no-bloom computation (fp kill verified)") {
    // the bloom may only PRUNE: its false positives must die in the exact
    // confirm joins, so the census must match a sketch-free exact join
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(s, dir, "documents")
    val grams = Dedup.grams4(docs)
    val evalG = grams.filter($"doc_id" % 97 === 0).select($"g").distinct()
    val hit = grams.filter($"doc_id" % 97 =!= 0)
      .join(evalG, Seq("g"), "left_semi").select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val perSource = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"source").collect()
      .groupBy(_.getString(1)).map { case (src, rows) =>
        val n = rows.length.toLong
        val c = rows.count(r => hit(r.getLong(0))).toLong
        src -> ((n, c, n - c))
      }
    val got = Dedup.d10(s, dir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == perSource)
    assert(got.values.map(_._2).sum > 0, "census must be non-vacuous at sf0.001")
  }

  test("similarity is computed over the pruned shingle space") {
    // docs 1/2 share a hot shingle (df=4 > tau=3, via two padding docs)
    // AND three rare ones; the hot shingle must drop out of BOTH the
    // intersection and the per-doc sizes — similarity over what remains.
    val docs = Seq(
      1L -> "h1 h2 h3 r1 r2 r3",
      2L -> "h1 h2 h3 r1 r2 r3 x1",
      8L -> "h1 h2 h3 q1 q2 q3",
      9L -> "h1 h2 h3 p1 p2 p3")
    val stats = Dedup.pairStats(arrs(docs), tau = 3L)
      .filter("da = 1 AND db = 2").collect()
    assert(stats.length == 1)
    // doc 1: {h1h2h3, h2h3r1, h3r1r2, r1r2r3}, doc 2 adds r2r3x1; pruning
    // h1h2h3 (df 4) leaves i=3, na=3, nb=4 — pruned-space Jaccard 3/4
    val r = stats.head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((3L, 3L, 4L)))
  }

  test("semantic dedup: identical pair drops the higher id; sub-threshold survives") {
    val s = spark
    import s.implicits._
    // one cell (only vec 0 is a centroid): 0 and 1 identical (cos 1.0),
    // 2 orthogonal to both (cos 0), 3 at cos 0.3 to 2 — below tau 0.4
    val emb = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0f, 0.3f, 0.954f, 0f)
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "srcA"), (1L, "srcB"), (2L, "srcA"), (3L, "srcC")
    ).toDF("doc_id", "source")
    val out = Dedup.semanticDedup(emb, docs, 0.4).collect()
      .map(r => (r.getLong(0),
        r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSeq
    assert(out == Seq(
      (0L, true, -1L),
      (1L, false, 0L), // identical to 0 → dropped, 0 is the survivor
      (2L, true, -1L),
      (3L, true, -1L))) // cos 0.3 < tau → kept
  }

  test("d14 funnel: monotone stages, exact-stage brute check, ppm arithmetic") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.d14(s, dir).collect()
    assert(rows.nonEmpty)
    // full-corpus flags make each column "survivors of stages 1..k":
    // the funnel must be monotone per source, and ppm is floor int math
    rows.foreach { r =>
      val (n, e, nd, cl) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= e && e >= nd && nd >= cl && cl >= 0, s"non-monotone: $r")
      assert(r.getLong(5) == cl * 1000000L / n, s"ppm mismatch: $r")
    }
    // stage-1 survivors = min-id per exact text group, independently derived
    val docs = Tables.t(s, dir, "documents")
      .select($"doc_id", $"source", $"text").collect()
    val keep = docs.groupBy(_.getString(2)).map(_._2.map(_.getLong(0)).min).toSet
    val exact = docs.filter(r => keep(r.getLong(0)))
      .groupBy(_.getString(1)).map { case (src, rs) => src -> rs.length.toLong }
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == exact)
    // at least one stage drops something somewhere, else the op is vacuous
    assert(rows.map(r => r.getLong(1) - r.getLong(4)).sum > 0)
  }

  test("d15 sweep: monotone in threshold, 0.5 row equals the d02 pair count") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.d15(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    // tightening the threshold can only shrink both counts
    rows.sliding(2).foreach {
      case Seq((_, p1, d1), (_, p2, d2)) => assert(p1 >= p2 && d1 >= d2)
      case _ =>
    }
    // the 0.5 row must agree with the d02 pair generator it sweeps
    val pairs = Dedup.jaccardPairs(s, dir, 0.5)
      .select($"da", $"db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val at5 = rows.find(_._1 == 5L)
    assert(pairs.nonEmpty && at5.isDefined, "sweep must be non-vacuous at sf0.001")
    assert(at5.get._2 == pairs.length.toLong)
    assert(at5.get._3 == pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
  }

  test("d21 sweep: candidate sets nest as bands widen; truth is constant") {
    // r=4 band agreement implies agreement on both covered r=2 sub-bands,
    // so candidates(8) ⊆ candidates(4) ⊆ candidates(2) — counts and
    // recall must be nonincreasing in r, and the truth column constant
    val rows = Dedup.d21(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).toSeq
    assert(rows.map(_._1) == Seq(2L, 4L, 8L))
    assert(rows.map(_._4).distinct.size == 1, "truth set must not vary with r")
    assert(rows.head._2 > 0, "sweep must be non-vacuous at sf0.001")
    rows.sliding(2).foreach {
      case Seq((_, c1, t1, _, r1), (_, c2, t2, _, r2)) =>
        assert(c1 >= c2 && t1 >= t2 && r1 >= r2)
      case _ =>
    }
  }

  test("d18: cross-split pairs normalize to (lo, hi) splits with aligned docs") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, 2L),   // train-test leak (1 train, 2 test)
      (3L, 4L),   // test-train leak REVERSED (3 test, 4 train)
      (5L, 6L),   // within-train: not a leak
      (7L, 8L)).toDF("da", "db") // train-valid leak
    val splits = Seq(
      1L -> "train", 2L -> "test", 3L -> "test", 4L -> "train",
      5L -> "train", 6L -> "train", 7L -> "train", 8L -> "valid")
      .toDF("doc_id", "split")
    val rows = Dedup.splitLeakage(pairs, splits).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      // 'test' < 'train' lexicographically: test-side doc is doc_a
      ("test", "train", 2L, 2L, 2L, 2L, 1L),
      ("train", "valid", 1L, 1L, 1L, 7L, 8L)))
  }

  test("d17: digit-masked templates collapse; exact dups alone don't qualify") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // template family A: 3 docs, 3 distinct texts, 2 sources
      (1L, "web", "Order 123 shipped  to zone 9"),
      (2L, "web", "Order 456 shipped to zone 77"),
      (3L, "mail", "Order 789 shipped to zone 5"),
      // exact dups (same text twice): ONE distinct text → filtered out
      (4L, "web", "hello world"),
      (5L, "web", "hello world"),
      // template family B: 2 docs, 2 distinct texts, 1 source
      (6L, "web", "v1 build"),
      (7L, "web", "v2 build"),
      // singleton: no group
      (8L, "mail", "unique text")).toDF("doc_id", "source", "text")
    val rows = Dedup.templateGroups(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      // rank 1: family A (3 docs; double space collapsed by the mask)
      (1, 3L, 3L, 2L, 1L),
      // rank 2: family B
      (2, 2L, 2L, 1L, 6L)))
  }

  test("d25: cross-shard pair accounting on a constructed pair layout") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (0L, 8L),   // both shard 0 → within
      (2L, 10L),  // both shard 2 → within
      (0L, 1L),   // shards 0 vs 1 → missed by an id-sharded pass
      (3L, 12L))  // shards 3 vs 4 → missed
      .toDF("da", "db")
    val r = Dedup.shardConsistency(pairs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 2L, 500000L)))
  }

  test("d24: rolling-window duplication coverage and the strict-majority flag") {
    val s = spark
    import s.implicits._
    val w = (1 to 12).map(i => s"w$i")
    val docs = Seq(
      // A: 12 words → 3 rolling 10-grams (w1..10, w2..11, w3..12)
      (1L, "s1", w.mkString(" ")),
      // B: same first 11 words, different 12th → shares A's first two
      // grams; its third gram is unique. 2 of 3 duplicated → majority.
      (2L, "s1", (w.take(11) :+ "other").mkString(" ")),
      // C: exactly 10 unrelated words → 1 gram, unshared
      (3L, "s2", (1 to 10).map(i => s"x$i").mkString(" ")),
      // D: 9 words — below the window width, contributes nothing
      (4L, "s2", (1 to 9).map(i => s"y$i").mkString(" "))).toDF(
      "doc_id", "source", "text")
    val rows = Dedup.dupSpanCoverage(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows == Seq(
      // s1: 6 types, 4 duplicated (2 per doc), ppm = 4e6 div 6; both docs
      // have 2*2 > 3 → 2 mostly-dup docs
      ("s1", 6L, 4L, 666666L, 2L),
      ("s2", 1L, 0L, 0L, 0L)))
  }
}
