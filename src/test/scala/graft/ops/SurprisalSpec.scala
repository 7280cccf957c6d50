package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t35's corpus-trained unigram scoring, pinned on a hand-built corpus
  * where every count — and therefore every integer ppm — is known:
  * 102 tokens total (a×99, z×2, q×1), so
  *   cppm(a) = 1e6·99 div 102 = 970588
  *   cppm(z) = 1e6·2  div 102 = 19607
  *   cppm(q) = 1e6·1  div 102 = 9803  (< RareCppm → rare)
  */
class SurprisalSpec extends AnyFunSuite with SparkFixture {

  test("t35: integer ppm scoring, exact sums, and the rare-token counter") {
    val s = spark
    import s.implicits._
    val d1 = (Seq.fill(99)("a") :+ "z").mkString(" ") // 100 tokens
    val d2 = "z q"                                    // 2 tokens
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val rows = TextAnalysis.surprisalProfile(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    val cA = 970588L; val cZ = 19607L; val cQ = 9803L
    assert(TextAnalysis.RareCppm > cQ && TextAnalysis.RareCppm < cZ,
      "threshold must separate q (rare) from z (not rare) for this pin")
    val sum1 = 99 * cA + cZ
    val sum2 = cZ + cQ
    assert(rows == Seq(
      (1L, 100L, sum1, sum1.toDouble / 100, 0L),
      (2L, 2L, sum2, sum2.toDouble / 2, 1L)))
  }

  test("t37: every quality rule fires on its constructed violator, and only it") {
    val s = spark
    import s.implicits._
    // a doc that passes all four rules: 25 mid-length words incl. 2 stops
    val pass = (Seq("the", "a") ++ (1 to 23).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      ("ok", pass),
      // len: 10 words (distinct bigrams keep rep quiet; stops + mid
      // lengths keep the other rules quiet)
      ("len", (Seq("the", "a") ++ (1 to 8).map(i => s"word$i")).mkString(" ")),
      // wordlen: 25 one-char words (all distinct → rep quiet) → mean < 3
      ("wordlen", (Seq("the", "a") ++ ('b' to 'x').map(_.toString))
        .mkString(" ")),
      // stop: 25 mid-length words, none in the stop list
      ("stop", (1 to 25).map(i => s"token$i").mkString(" ")),
      // rep: 'dupword goes' ×12 — top bigram 12 of 25 (>20%), mean word
      // length stays ≥ 3
      ("rep", (Seq("the", "a") ++ Seq.fill(12)(Seq("dupword", "goes")).flatten)
        .mkString(" "))).toDF("source", "text")
    val rows = TextAnalysis.qualityRules(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    // (fail_len, fail_wordlen, fail_stop, fail_rep, n_pass) per source
    assert(rows("ok") == ((0L, 0L, 0L, 0L, 1L)))
    assert(rows("len") == ((1L, 0L, 0L, 0L, 0L)))
    assert(rows("wordlen") == ((0L, 1L, 0L, 0L, 0L)))
    assert(rows("stop") == ((0L, 0L, 1L, 0L, 0L)))
    assert(rows("rep") == ((0L, 0L, 0L, 1L, 0L)))
  }
}
