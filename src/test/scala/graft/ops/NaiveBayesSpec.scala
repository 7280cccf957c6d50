package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t51's trained Naive-Bayes table and classifier, pinned against a JVM
  * re-derivation of the exact arithmetic: hashing-trick buckets, add-one
  * smoothed integer-ppm likelihoods/priors (BigInt truncation toward
  * zero), the dot-product score, and the lang-ascending argmax tiebreak. */
class NaiveBayesSpec extends AnyFunSuite with SparkFixture {

  private val B = TextAnalysis.HashBuckets

  /** JVM mirror of HashedBowCounts' token bucket: ((a*31+ascii) mod
    * 1000000007 folded over chars) mod B. */
  private def bucket(w: String): Int =
    (w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L) % B).toInt

  private def cnts(text: String): Seq[Long] = {
    val v = new Array[Long](B)
    text.split(" ", -1).foreach(w => v(bucket(w)) += 1)
    v.toSeq
  }

  private val corpus = Seq(
    (1L, "alpha alpha beta", "en"),
    (2L, "alpha gamma", "en"),
    (3L, "omega omega delta", "zh"),
    (4L, "omega epsilon", "zh"),
    (5L, "alpha omega", "fr"))

  test("nbModel: add-one-smoothed ppm table matches the BigInt hand fit") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.nbModel(corpus.toDF("doc_id", "text", "lang"))
    assert(model.map(_._1) == Seq("en", "fr", "zh"), "langs ascending")
    val byLang = corpus.groupBy(_._3)
    for ((lang, prior, likes) <- model) {
      val docs = byLang(lang)
      val cb = docs.map(d => cnts(d._2)).transpose.map(_.sum)
      val tl = cb.sum
      val expLikes = cb.map(c => (BigInt(c + 1) * 1000000 / (tl + B)).toLong)
      assert(likes == expLikes, s"$lang likelihoods")
      val expPrior =
        (BigInt(docs.size + 1) * 1000000 / (corpus.size + byLang.size)).toLong
      assert(prior == expPrior, s"$lang prior")
    }
  }

  test("nbClassify: score is the exact dot product; argmax ties go to the first lang") {
    val s = spark
    import s.implicits._
    val model = TextAnalysis.nbModel(corpus.toDF("doc_id", "text", "lang"))
    val out = TextAnalysis.nbClassify(
      Seq((10L, "alpha alpha", "en"), (11L, "omega omega omega", "en"))
        .toDF("doc_id", "text", "lang"), model)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getBoolean(4))).toMap
    def score(text: String, lang: String): Long = {
      val (_, prior, likes) = model.find(_._1 == lang).get
      prior + cnts(text).zip(likes).map { case (c, w) => c * w }.sum
    }
    val best10 = model.map(_._1).map(l => (score("alpha alpha", l), l))
    assert(out(10L)._2 == best10.map(_._1).max)
    assert(out(10L)._1 == "en" && out(10L)._3)
    assert(out(11L)._1 == "zh" && !out(11L)._3, "mislabeled doc flagged")

    // a synthetic exact tie: identical classes must resolve lang-ascending
    val tieModel = Seq(
      ("bb", 5L, Seq.fill(B)(7L)), ("aa", 5L, Seq.fill(B)(7L)))
    val tied = TextAnalysis.nbClassify(
      Seq((1L, "x y z", "aa")).toDF("doc_id", "text", "lang"), tieModel)
      .collect().head
    assert(tied.getString(2) == "aa", "tie must go to the ascending lang")
  }

  test("rankAuc: Mann-Whitney identities — perfect separation, all-tied, reversal") {
    val s = spark
    import s.implicits._
    def auc(rows: Seq[(Long, Boolean)]): Long =
      TextAnalysis.rankAuc(rows.toDF("score", "is_match"))
        .collect().head.getLong(3)
    // positives strictly above negatives → AUC = 1
    assert(auc(Seq((1L, false), (2L, false), (5L, true), (9L, true))) == 1000000L)
    // everything tied → midrank AUC = 1/2 exactly
    assert(auc(Seq((3L, true), (3L, false), (3L, true), (3L, false))) == 500000L)
    // perfectly reversed → AUC = 0
    assert(auc(Seq((9L, false), (5L, false), (2L, true), (1L, true))) == 0L)
    // hand case: scores [1-,2+,2-,3+]: midranks pos = 2.5 + 4 = 6.5,
    // AUC = (6.5 - 3) / 4 = 0.875
    assert(auc(Seq((1L, false), (2L, true), (2L, false), (3L, true))) == 875000L)
    // degenerate classes → NULL auc, counts still exact
    val r = TextAnalysis.rankAuc(
      Seq((1L, true), (2L, true)).toDF("score", "is_match")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.isNullAt(3))
  }

  test("nbClassify: empty model degrades to 'und' at score 0") {
    val s = spark
    import s.implicits._
    val out = TextAnalysis.nbClassify(
      Seq((1L, "anything", "en")).toDF("doc_id", "text", "lang"), Seq.empty)
      .collect().head
    assert(out.getString(2) == "und" && out.getLong(3) == 0L &&
      !out.getBoolean(4))
  }
}
