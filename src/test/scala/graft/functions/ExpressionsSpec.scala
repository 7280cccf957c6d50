package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom codegen expressions vs their interpreted HOF equivalents —
  * the results must be bit-identical (same sequential fold order). */
class ExpressionsSpec extends AnyFunSuite with SparkFixture {

  test("DotProduct equals the aggregate/zip_with fold, including null rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
      DotProduct($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("ref")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // null input -> null output
    val n = df.select(DotProduct(lit(null).cast("array<double>"), $"b"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("SqDist equals the aggregate/zip_with fold bit-for-bit") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array(1e-9, 1e9), Array(-1e9, 1e-9)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
      SqDist($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)), lit(0.0),
        (acc, x) => acc + x).as("ref")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    val n = df.select(SqDist($"a", lit(null).cast("array<double>")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("RollingHash equals the split/ascii fold") {
    val s = spark
    import s.implicits._
    val df = Seq("hello world", "", "a", "Zürich 🙂 mixed", "x y z").toDF("t")
    val rows = df.select(
      RollingHash($"t", 31L).as("fast"),
      aggregate(
        filter(split($"t", ""), ch => length(ch) > 0),
        lit(0L),
        (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L).as("ref"),
      $"t").collect()
    rows.foreach { r =>
      // the HOF form uses Spark's ascii() (first UTF-16 code unit), the
      // expression iterates code points — identical for BMP text, which
      // is what the oracles require; skip the emoji row for the HOF ref
      if (!r.getString(2).exists(Character.isSurrogate))
        assert(r.getLong(0) == r.getLong(1), s"mismatch for '${r.getString(2)}'")
    }
  }

  test("MinHashAgg equals the 64-min-column aggregation") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 17L), (1L, 9999L), (1L, 123456789L), (2L, 42L))
      .toDF("g", "h")
    val viaAgg = df.groupBy($"g").agg(MinHashAgg($"h", 64).as("sigs"))
      .orderBy($"g").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector))
    val sigCols = (0 until 64).map(j =>
      min(((lit(2L * j + 1)) * $"h" + lit(j.toLong)) % 1000000007L).as(s"s$j"))
    val viaCols = df.groupBy($"g").agg(sigCols.head, sigCols.tail: _*)
      .orderBy($"g").collect()
      .map(r => (r.getLong(0), (1 to 64).map(r.getLong(_)).toVector))
    assert(viaAgg.toSeq == viaCols.toSeq)
  }

  test("SimHash60 equals the per-word TF contribution aggregation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the"), // repeated word: TF weighting matters
      (3L, "one"),
      (4L, "  double  spaced  "), // empty tokens must be skipped
      (5L, "")) // no non-empty words -> all-zero contributions
      .toDF("doc_id", "text")
    // reference: explode + TF groupBy + 60 contribution sums (the plan
    // the compiled kernel replaced)
    val tf = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
      .withColumn("h1", RollingHash($"w", 31L))
      .withColumn("h2", RollingHash($"w", 37L))
    val contribCols = (0 until 60).map { j =>
      val h = if (j < 30) $"h1" else $"h2"
      sum($"cnt" * ((shiftright(h, j % 30) % 2) * 2 - 1)).as(s"c$j")
    }
    val ref = tf.groupBy($"doc_id")
      .agg(contribCols.head, contribCols.tail: _*)
      .select($"doc_id",
        (0 until 60).map(j =>
          when(col(s"c$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = docs.select($"doc_id", SimHash60(split($"text", " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 5 has no TF rows in the reference plan; the kernel yields 0
    assert(ref.keySet == Set(1L, 2L, 3L, 4L))
    ref.foreach { case (id, sh) => assert(fast(id) == sh, s"doc $id") }
    assert(fast(5L) == 0L)
  }

  test("CappedCollect equals collect_list (as a multiset) while under the cap") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextLong() % 100))
    val df = rows.toDF("k", "v").repartition(8)
    val capped = df.groupBy($"k").agg(CappedCollect($"v", 1000).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val ref = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(capped.keySet == ref.keySet)
    ref.foreach { case (k, vs) => assert(capped(k) == vs, s"group $k") }
  }

  test("CappedCollect saturates at the cap with a subset of the group") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).map(v => ("hot", v)).toDF("k", "v").repartition(8)
    val got = df.groupBy($"k").agg(CappedCollect($"v", 7).as("vs"))
      .collect().head.getSeq[Long](1)
    assert(got.length == 7, s"must hold exactly cap elements, got ${got.length}")
    assert(got.toSet.subsetOf((1L to 500L).toSet))
    assert(got.distinct.length == 7, "merge must not duplicate elements")
  }

  test("MaxSortedRun equals max(count) of the exploded groupBy") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("b a", "a b", "b a", "b a", "c d")),
      (2L, Seq("x y")),
      (3L, Seq.empty[String]))
      .toDF("doc_id", "bgs")
    val fast = df.select($"doc_id", MaxSortedRun(array_sort($"bgs")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
    val ref = df.filter(size($"bgs") > 0)
      .select($"doc_id", explode($"bgs").as("b"))
      .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ref.foreach { case (id, m) => assert(fast(id) == m) }
  }

  test("TopBigramRun equals MaxSortedRun over the built+sorted bigram array") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // space-free words only — the kernel's documented precondition (the
    // word array comes from a split on " ")
    val vocab = Vector("a", "b", "rep", "", "z")
    val docs = (1L to 40L).map { id =>
      id -> Vector.fill(2 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
    } :+ (99L -> Vector("solo")) :+ (100L -> Vector.empty[String])
    val df = docs.toDF("doc_id", "ws")
    // the HOF reference only exists for >= 2 words (same filter t06 applies
    // before building bigrams — sequence(0, size-2) is descending below it)
    val rows = df.filter(size($"ws") >= 2).select(
      $"doc_id",
      TopBigramRun($"ws").as("fused"),
      MaxSortedRun(array_sort(expr(
        "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))")))
        .as("ref")).collect()
    assert(rows.length == 40)
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
    // degenerate inputs: no bigrams -> 0
    val deg = df.filter(size($"ws") < 2)
      .select($"doc_id", TopBigramRun($"ws")).collect()
    assert(deg.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(99L -> 0L, 100L -> 0L))
  }

  test("Shingles3 equals the HOF transform + array_distinct chain") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "a b c d e",
      "x y z",
      "too short",
      "",
      "r r r r", // duplicate shingles collapse
      "a  b c d") // empty token inside — concat keeps the double space
      .toDF("text").select(split($"text", " ").as("ws"))
    val rows = df.select(
      ShingleKernels.shingles3($"ws").as("fast"),
      when(size($"ws") >= 3, array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .otherwise(array().cast("array<string>")).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("Shingles3/ShinglesK skip null words like concat_ws — never emit null") {
    val s = spark
    import s.implicits._
    // a null element inside the word array (legal input: containsNull=true)
    val df = Seq(1).toDF("one").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("ws"))
    val rows = df.select(
      ShingleKernels.shingles3($"ws").as("s3"),
      ShingleKernels.shinglesK($"ws", 4).as("s4"),
      array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
        .as("ref3")).collect()
    val (s3, s4, ref3) = (rows(0).getSeq[String](0),
      rows(0).getSeq[String](1), rows(0).getSeq[String](2))
    assert(s3 == ref3, s"s3=$s3 ref=$ref3")
    assert(!s3.contains(null) && !s4.contains(null),
      "null shingle inside a containsNull=false array")
    assert(s4 == Seq("a b c"))
  }

  test("ShinglesK generalizes Shingles3 and handles short arrays") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "a b c d e f g h i",
      "one two three four",
      "short",
      "",
      "r r r r r") // duplicates collapse
      .toDF("text").select(split($"text", " ").as("ws"))
    // k=3 must agree with the dedicated Shingles3 kernel
    val k3 = df.select(
      ShingleKernels.shinglesK($"ws", 3).as("k"),
      ShingleKernels.shingles3($"ws").as("three")).collect()
    k3.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // k=4 must agree with the HOF reference chain
    val k4 = df.select(
      ShingleKernels.shinglesK($"ws", 4).as("fast"),
      when(size($"ws") >= 4, array_distinct(expr(
        "transform(sequence(0, size(ws)-4), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))")))
        .otherwise(array().cast("array<string>")).as("ref")).collect()
    k4.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("SimHash60Text equals SimHash60 over split words") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val cases = Seq("", " ", "a", "a b c", "a  b", " lead", "trail ",
      "é ü ö", "same same same") ++
      (1 to 60).map { _ =>
        (0 until rnd.nextInt(15)).map(_ =>
          Seq("alpha", "b", "", "gamma7", "Δδ").apply(rnd.nextInt(5))).mkString(" ")
      }
    val rows = cases.toDF("text").select(
      SimHash60Text($"text").as("fused"),
      SimHash60(split($"text", " ", -1)).as("ref")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getLong(0) == r.getLong(1), s"text='$c'")
    }
  }

  test("ShinglesText equals ShinglesK over split, incl. space edge cases") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val cases = Seq("", " ", "  ", "a", "a b c d e", "a  b c d", " lead",
      "trail ", "r r r r", "a b", "x  ", "é ü ö ß µ") ++
      (1 to 60).map { _ =>
        (0 until rnd.nextInt(12)).map(_ =>
          Seq("a", "bb", "", "ccc", "d").apply(rnd.nextInt(5))).mkString(" ")
      }
    for (k <- Seq(2, 3, 4)) {
      val rows = cases.toDF("text")
        .select(
          ShingleKernels.shinglesText($"text", k).as("fused"),
          ShingleKernels.shinglesK(split($"text", " ", -1), k).as("ref"))
        .collect()
      rows.zip(cases).foreach { case (r, c) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k text='$c' fused=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
      }
    }
  }

  test("ShingleHashesText equals sorted-distinct xxhash64 over ShinglesText") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val cases = Seq("", " ", "  ", "a", "a b c d e", "a  b c d", " lead",
      "trail ", "r r r r", "a b", "é ü ö ß µ") ++
      (1 to 60).map { _ =>
        (0 until rnd.nextInt(12)).map(_ =>
          Seq("a", "bb", "", "ccc", "d").apply(rnd.nextInt(5))).mkString(" ")
      }
    for (k <- Seq(2, 3, 4)) {
      val rows = cases.toDF("text")
        .select(
          ShingleKernels.shingleHashesText($"text", k).as("fused"),
          // reference: hash each string shingle with the same xxhash64
          // seed, distinct, sorted
          array_sort(array_distinct(transform(
            ShingleKernels.shinglesText($"text", k),
            g => xxhash64(g)))).as("ref"))
        .collect()
      rows.zip(cases).foreach { case (r, c) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k text='$c' fused=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
      }
    }
  }

  test("NgramCountsText equals explode+groupBy counting over split words") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val cases = Seq("", " ", "a", "a b a b a", "r r r r", "a  b c d",
      " x y ", "é ü é ü") ++
      (1 to 60).map { _ =>
        (0 until rnd.nextInt(12)).map(_ =>
          Seq("a", "bb", "", "ccc").apply(rnd.nextInt(4))).mkString(" ")
      }
    for (k <- Seq(2, 3)) {
      cases.zipWithIndex.foreach { case (text, id) =>
        val fused = Seq(text).toDF("text")
          .select(explode(ShingleKernels.ngramCountsText($"text", k)).as("gc"))
          .select($"gc.g", $"gc.c").as[(String, Long)].collect().toMap
        val words = text.split(" ", -1)
        val ref =
          if (words.length < k) Map.empty[String, Long]
          else words.sliding(k).map(_.mkString(" ")).toSeq
            .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
        assert(fused == ref, s"k=$k case#$id text='$text'")
      }
    }
  }

  test("MinHash64 kernel equals MinHashAgg over the exploded shingles") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("lorem ipsum dolor")),
      (3L, Seq("x y z", "x y z"))) // duplicates don't change the min
      .toDF("doc_id", "arr")
    val fast = df.select($"doc_id", ShingleKernels.minHash64($"arr").as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaAgg = df.select($"doc_id", explode($"arr").as("s"))
      .select($"doc_id", RollingHash($"s", 31L).as("h"))
      .groupBy($"doc_id").agg(MinHashAgg($"h", 64).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(fast == viaAgg)
  }

  test("FrameCuts equals a brute-force frame compare on random strings") {
    val rnd = new scala.util.Random(7)
    def brute(s: String, fl: Int, st: Int, md: Int): Long = {
      val nf = math.max(0, Math.floorDiv(s.length - fl, st) + 1)
      (0 until nf - 1).count { k =>
        (0 until fl).count(i => s(k * st + i) != s((k + 1) * st + i)) >= md
      }.toLong
    }
    val cases = Seq("", "a", "x" * 16, "x" * 17, "x" * 48) ++
      (1 to 30).map(_ => rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", FrameCuts($"t", 16, 32, 12).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t, 16, 32, 12), s"case $i: '$t'")
    }
  }

  test("CharStats equals a brute-force code-point histogram on random strings") {
    val rnd = new scala.util.Random(11)
    def brute(s: String): (Long, Long) = {
      val m = s.codePoints().toArray.groupBy(identity).view.mapValues(_.length.toLong)
      if (m.isEmpty) (0L, 0L) else (m.values.max, m.size.toLong)
    }
    val cases = Seq("", "a", "aaaa", "ab", "aab", "héllo wörld", "日本語テキスト") ++
      (1 to 30).map(_ => rnd.alphanumeric.take(rnd.nextInt(100)).mkString)
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", CharStats($"t").as("st"))
      .select($"id", $"st.mode_cnt", $"st.n_distinct")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t), s"case $i: '$t'")
    }
  }

  test("WindowEnergy frames, sums, peaks and quiet-counts match a brute walk") {
    def brute(t: String, win: Int, quietMax: Long): (Long, Long, Long, Long) = {
      val cps = t.codePoints().toArray
      val wins = cps.grouped(win).filter(_.length == win)
        .map(_.map(_.toLong).sum).toSeq
      (wins.size.toLong, wins.sum, if (wins.isEmpty) 0L else wins.max,
        wins.count(_ < quietMax).toLong)
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", "abcd", "abcde", "    tiny    energy",
      "日本語テキストとasciiの混在テスト文字列です") ++
      (1 to 30).map(_ => rnd.alphanumeric.take(rnd.nextInt(120)).mkString)
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", WindowEnergy($"t", 4, 300L).as("we"))
      .select($"id", $"we.n_windows", $"we.energy_sum", $"we.peak_energy",
        $"we.n_quiet")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t, 4, 300L), s"case $i: '$t'")
    }
  }

  test("HashedBow equals the transform/filter HOF chain on every summary field") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val cases = Seq("", " ", "a", "a b a", "a  b ", "tie0 tie1",
      "多字节 токены mixed ascii") ++
      (1 to 25).map(_ => (1 to rnd.nextInt(30)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val B = 16L
    val buckets = transform(split($"t", " "), w => RollingHash(w, 31L) % lit(B))
    val cnts = transform(sequence(lit(0L), lit(B - 1)),
      b => size(filter(buckets, x => x === b)).cast("long"))
    val rows = df.select(
      $"id",
      HashedBow($"t", 16).as("fast"),
      struct(
        size(filter(cnts, c => c > 0)).cast("long").as("nnz"),
        aggregate(cnts, lit(0L), (a, c) => a + c * c).as("l2sq"),
        array_max(cnts).as("max_cnt"),
        (array_position(cnts, array_max(cnts)) - 1).as("top_bucket")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(1).toSeq == r.getStruct(2).toSeq,
        s"case ${r.getLong(0)}: '${cases(r.getLong(0).toInt)}'")
    }
  }

  test("HashedBowCounts is the dense vector behind HashedBow's summary") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val cases = Seq("", " ", "a", "a b a", "a  b ", "tie0 tie1",
      "多字节 токены mixed ascii") ++
      (1 to 25).map(_ => (1 to rnd.nextInt(30)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString).mkString(" "))
    val rows = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id",
        HashedBowCounts($"t", 16).as("cnts"),
        HashedBow($"t", 16).as("sum"),
        (size(split($"t", " ", -1))).cast("long").as("n_tok"))
      .collect()
    rows.foreach { r =>
      val cnts = r.getSeq[Long](1)
      val sm = r.getStruct(2)
      assert(cnts.length == 16, s"case ${r.getLong(0)}: width")
      // the dense vector folds to exactly HashedBow's summary fields
      assert(cnts.count(_ > 0).toLong == sm.getLong(0), "nnz")
      assert(cnts.map(c => c * c).sum == sm.getLong(1), "l2sq")
      assert(cnts.max == sm.getLong(2), "max_cnt")
      assert(cnts.indexOf(cnts.max).toLong == sm.getLong(3), "top_bucket")
      // total mass = token count (trailing/consecutive empties included)
      assert(cnts.sum == r.getLong(3), s"case ${r.getLong(0)}: mass")
    }
  }

  test("CharGrams equals the sliding-substring HOF chain, distinct + ordered") {
    def brute(t: String, k: Int): Seq[String] = {
      val cps = t.codePoints().toArray
      if (cps.length < k) Seq.empty
      else (0 to cps.length - k).map(i => new String(cps, i, k)).distinct
    }
    val rnd = new scala.util.Random(13)
    val cases = Seq("", "ab", "abc", "aaaa", "abcabc", "日本語テキスト混在abc") ++
      (1 to 25).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", CharGrams($"t", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t, 3), s"case $i: '$t'")
    }
  }

  test("IntersectCount equals size(array_intersect) on sorted random arrays") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"w$i")
    // include empties, full overlap, disjoint, and duplicate elements
    // (the kernel must count each matched value once, like array_intersect)
    def randArr(): Seq[String] = {
      val base = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      val dups = base ++ Seq.fill(rnd.nextInt(4))(
        if (base.nonEmpty) base(rnd.nextInt(base.size)) else "w0")
      dups.sorted
    }
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "a", "b"), Seq("a", "b", "b"))) ++
      (1 to 40).map(_ => (randArr(), randArr()))
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
      .select($"id",
        IntersectCount($"a", $"b").as("k"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"case ${r.getLong(0)}: kernel=${r.getLong(1)} ref=${r.getLong(2)}")
    }
  }

  test("FrameDHash equals a brute-force gradient walk on random strings") {
    val rnd = new scala.util.Random(53)
    def brute(s: String, fl: Int, st: Int): Seq[Long] = {
      val n = if (s.length < fl) 0 else (s.length - fl) / st + 1
      (0 until n).map { k =>
        (0 until fl - 1).foldLeft(0L) { (acc, i) =>
          if (s(k * st + i) > s(k * st + i + 1)) acc | (1L << i) else acc
        }
      }
    }
    val cases = Seq("", "x" * 60, "x" * 61, "ab" * 40) ++
      (1 to 30).map(_ => rnd.alphanumeric.take(rnd.nextInt(250)).mkString)
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", FrameDHash($"t", 61, 32).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t, 61, 32), s"case $i")
    }
  }

  test("BpeEncode equals a brute-force Sennrich apply on random corpora") {
    val rnd = new scala.util.Random(41)
    // brute reference: chars → per-merge left-to-right non-overlapping pass
    def bruteWord(w: String, merges: Seq[(String, String)]): Int = {
      var syms = w.map(_.toString).toList
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: t if x == a && y == b => out += (a + b); rest = t
          case x :: t => out += x; rest = t
          case Nil => ()
        }
        syms = out.toList
      }
      syms.size
    }
    def brute(text: String, merges: Seq[(String, String)]): (Long, Long) = {
      val ws = text.split(" ").filter(_.nonEmpty)
      (ws.length.toLong, ws.map(w => bruteWord(w, merges).toLong).sum)
    }
    val merges = Seq("a" -> "b", "ab" -> "c", "b" -> "b", "c" -> "a")
    val cases = Seq("", " ", "ab", "abc abc", "bbbb", "abab", "  a  b ", "ca ab") ++
      (1 to 40).map(_ => (0 until rnd.nextInt(8)).map(_ =>
        (0 until (1 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString)
        .mkString(" "))
    val s = spark
    import s.implicits._
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", BpeEncode($"t", merges).as("e"))
      .select($"id", $"e.n_words", $"e.n_pieces")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == brute(t, merges), s"case $i: '$t'")
    }
  }

  test("bpeMerges learns the expected table on a hand-built corpus") {
    val s = spark
    import s.implicits._
    // "aa" dominates: freq-weighted pairs are (a,a)=6 over "aaa"x2 docs
    // + 2 over "aab"; after merging (a,a) the best is (aa,b)
    val docs = Seq("aaa aaa aab", "aaa aab ba").toDF("text")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, 2)
    assert(merges.head == ("a", "a"), merges.toString)
    assert(merges.size == 2)
    // the second merge must involve the learned "aa" symbol
    assert(merges(1)._1 == "aa" || merges(1)._2 == "aa", merges.toString)
  }

  test("SortedPairs equals the HOF transform/slice/flatten chain") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(7L, 9L),
      Seq(5L), // singleton: no pairs
      Seq.empty[Long])
      .toDF("parts")
    val rows = df.select(
      PairKernels.sortedPairs($"parts").as("fast"),
      expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |    y -> struct(x as da, y as db))))""".stripMargin).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) ==
        r.getSeq[org.apache.spark.sql.Row](1),
        s"fast=${r.getSeq(0)} ref=${r.getSeq(1)}")
    }
    // C(n,2) cardinality
    val n = df.select(explode(PairKernels.sortedPairs($"parts"))).count()
    assert(n == 6 + 1 + 0 + 0)
  }

  test("SortedPairsPacked equals packed SortedPairs; guards the 2^31 bound") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(7L, 9L),
      Seq((1L << 31) - 1L, 0L), // boundary keys still pack
      Seq(5L),
      Seq.empty[Long])
      .toDF("parts")
    val rows = df.select(
      PairKernels.sortedPairsPacked($"parts").as("fast"),
      transform(PairKernels.sortedPairs($"parts"),
        p => shiftleft(p.getField("da"), 32) + p.getField("db")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fast=${r.getSeq(0)} ref=${r.getSeq(1)}")
    }
    // out-of-range key fails LOUDLY, never silently merges
    val boom = intercept[Exception] {
      Seq(Seq(1L << 31, 2L)).toDF("parts")
        .select(PairKernels.sortedPairsPacked($"parts")).collect()
    }
    assert(boom.getMessage.contains("sorted_pairs_packed") ||
      Option(boom.getCause).exists(_.getMessage.contains("sorted_pairs_packed")),
      boom.toString)
  }

  test("SqDistLong equals the integer HOF fold, negatives included") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(-4L, 5L, 6L)),
      (Seq(0L, 0L), Seq(0L, 0L)),
      (Seq(-1048576L, 1048576L), Seq(1048576L, -1048576L)))
      .toDF("a", "b")
    val rows = df.select(
      SqDistLong($"a", $"b").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
        "(acc, v) -> acc + v)").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fast=${r.getLong(0)} ref=${r.getLong(1)}"))
  }

  test("expressions survive whole-stage codegen over a real plan") {
    val s = spark
    import s.implicits._
    val df = s.range(1000)
      .select($"id", concat(lit("doc"), $"id").as("t"),
        array($"id".cast("double"), lit(2.0)).as("v"))
      .select(RollingHash($"t", 37L).as("h"), DotProduct($"v", $"v").as("d"))
      .agg(sum($"h"), sum($"d"))
    val row = df.collect().head
    assert(row.getLong(0) > 0)
    assert(row.getDouble(1) > 0)
  }
}
