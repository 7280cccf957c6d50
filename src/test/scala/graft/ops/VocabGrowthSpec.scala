package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t26's Heaps-curve kernel on hand-built corpora (the oracle gate only
  * sees the synthetic corpus's degenerate all-in-bucket-0 curve). */
class VocabGrowthSpec extends AnyFunSuite with SparkFixture {

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    TextAnalysis.vocabGrowth(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("tokens credit their FIRST doc; buckets partition the id domain") {
    // ids 0..9 → bucket = id (hi = 10). "a" first at 0, reused later;
    // "b" first at 3; "c","d" first at 7.
    val out = run(Seq(
      0L -> "a a a",
      3L -> "b a",
      7L -> "c d a b",
      9L -> "a b c"))
    assert(out == Seq((0L, 1L, 1L), (3L, 1L, 2L), (7L, 2L, 4L)))
  }

  test("cumulative vocabulary is monotone and ends at the distinct-token count") {
    val out = run(Seq(
      0L -> "x y",
      5L -> "y z",
      9L -> "w"))
    assert(out.map(_._3) == out.map(_._3).sorted)
    assert(out.last._3 == 4L) // x y z w
    // idle buckets emit no row (sparse curve)
    assert(out.map(_._1) == Seq(0L, 5L, 9L))
  }

  test("a closed vocabulary collapses the whole curve into bucket 0") {
    val out = run(Seq(0L -> "t u", 4L -> "u t", 9L -> "t t u"))
    assert(out == Seq((0L, 2L, 2L)))
  }
}
