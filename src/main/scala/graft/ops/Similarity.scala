package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  *  - s01: brute-force cosine top-k (the correctness baseline),
  *  - s02: IVF-style search — assign vectors to coarse centroids, then
  *    search only the query's cell (probe=1) — the 100 TB scale path:
  *    the assignment is a broadcast argmax (no shuffle of the big side)
  *    and the search join is cell-partitioned instead of all-pairs,
  *  - s03: blocked embedding near-dup (within-label pairs over threshold).
  *
  * Numerics: dot products are computed as a left fold over per-element
  * double products (init 0.0), so results are IEEE-deterministic and
  * engine-independent; ranking uses round(sim, 6) with id tiebreaks.
  * All vector math uses codegen'd higher-order functions — no UDFs.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (deterministic).
    * Codegen'd custom Expression — same index-order fold as
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, compiled instead of
    * interpreted (see [[graft.functions.DotProduct]]). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** embeddings with double-cast vector and precomputed L2 norm. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(dot($"v", $"v")))
  }

  /** DuckDB mirror of the same fold: per-element double products reduced
    * left-to-right (list_reduce seeds with the first element, which equals
    * a 0.0-init fold for IEEE addition). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  // ---------------------------------------------------------------- s01
  /** Brute-force cosine top-5 for query vectors (vec_id % 100 = 0).
    * Queries are broadcast; the corpus streams — one pass, no shuffle of
    * the big side, top-k via per-query window. */
  def s01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = vecs(s, dir)
    val q = all.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"norm".as("qnorm"))
    val sim = all.join(broadcast(q), $"vec_id" =!= $"qid")
      .withColumn("sim", dot($"qv", $"v") / ($"qnorm" * $"norm"))
    val w = Window.partitionBy($"qid")
      .orderBy(round($"sim", 6).desc, $"vec_id")
    sim.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"qid", $"rank", $"vec_id".as("neighbor_id"), round($"sim", 4).as("sim"))
      .orderBy($"qid", $"rank")
  }

  val s01Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, norm AS qnorm FROM v WHERE vec_id % 100 = 0),
       |sim AS (SELECT qid, vec_id, ${dotSql("qe", "embedding")} / (qnorm * norm) AS sim
       |        FROM v JOIN q ON vec_id <> qid),
       |ranked AS (SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, vec_id) AS rank
       |  FROM sim)
       |SELECT qid, rank, vec_id AS neighbor_id, round(sim, 4) AS sim
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s02
  /** IVF probe-1 search: coarse centroids = vec_id % 100 = 0; every vector
    * is assigned to its nearest centroid (broadcast argmax); queries
    * (vec_id % 71 = 0) search only their own cell, top-3. */
  def s02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = vecs(s, dir)
    val cent = all.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"norm".as("cnorm"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy(round($"csim", 6).desc, $"cid")
    val assigned = all.join(broadcast(cent))
      .withColumn("csim", dot($"cv", $"v") / ($"cnorm" * $"norm"))
      .withColumn("arank", row_number().over(wAssign))
      .filter($"arank" === 1)
      .select($"vec_id", $"label", $"v", $"norm", $"cid")
    val q2 = assigned.filter($"vec_id" % 71 === 0)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"norm".as("qnorm"), $"cid".as("qcid"))
    val wTop = Window.partitionBy($"qid")
      .orderBy(round($"sim", 6).desc, $"vec_id")
    assigned.join(broadcast(q2), $"cid" === $"qcid" && $"vec_id" =!= $"qid")
      .withColumn("sim", dot($"qv", $"v") / ($"qnorm" * $"norm"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"vec_id".as("neighbor_id"),
        $"cid".as("cell"), round($"sim", 4).as("sim"))
      .orderBy($"qid", $"rank")
  }

  val s02Sql: String =
    s"""WITH v AS (SELECT vec_id, label, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, norm AS cnorm FROM v WHERE vec_id % 100 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, norm, cid FROM (
       |    SELECT v.vec_id, v.embedding, v.norm, cent.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(${dotSql("ce", "embedding")} / (cnorm * norm), 6) DESC, cid) AS arank
       |    FROM v CROSS JOIN cent)
       |  WHERE arank = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qe, norm AS qnorm, cid AS qcid
       |      FROM assigned WHERE vec_id % 71 = 0),
       |hits AS (SELECT qid, vec_id, cid, ${dotSql("qe", "embedding")} / (qnorm * norm) AS sim
       |         FROM assigned JOIN q ON cid = qcid AND vec_id <> qid),
       |ranked AS (SELECT qid, vec_id, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, vec_id) AS rank
       |  FROM hits)
       |SELECT qid, rank, vec_id AS neighbor_id, cid AS cell, round(sim, 4) AS sim
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- s03
  /** Blocked embedding near-dup: within-label pairs with cosine ≥ 0.4.
    * Label is the blocking key (at scale: LSH bucket / coarse centroid),
    * so the join is block-local instead of all-pairs. */
  def s03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = vecs(s, dir)
    val a = all.select($"label", $"vec_id".as("va"), $"v".as("xa"), $"norm".as("na"))
    val b = all.select($"label".as("lb"), $"vec_id".as("vb"), $"v".as("xb"), $"norm".as("nb"))
    a.join(b, $"label" === $"lb" && $"va" < $"vb")
      .withColumn("sim", dot($"xa", $"xb") / ($"na" * $"nb"))
      .filter($"sim" >= 0.4)
      .select($"va", $"vb", $"label", round($"sim", 4).as("sim"))
      .orderBy($"va", $"vb")
  }

  val s03Sql: String =
    s"""WITH v AS (SELECT vec_id, label, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings)
       |SELECT a.vec_id AS va, b.vec_id AS vb, a.label,
       |  round(${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm), 4) AS sim
       |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.4
       |ORDER BY va, vb""".stripMargin

  def all: Seq[Q] = Seq(
    Q("s01_cosine_topk", s01, Some(s01Sql), headline = true),
    Q("s02_ivf_ann", s02, Some(s02Sql), headline = true),
    Q("s03_embed_neardup", s03, Some(s03Sql)))
}
