package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph operators over DataFrames — the scale path for graph
  * queries that outgrow the driver-side Dag algebra (SURVEY §1.1 DAG note).
  *
  * g01 clusters near-duplicate documents into connected components — the
  * step a production dedup pipeline runs AFTER pair generation (d02/d03):
  * pairs say "a≈b"; components say "keep one doc per cluster".
  *
  * Algorithm: iterative min-label propagation. Each round every vertex
  * takes the min component id among itself and its neighbors; convergence
  * in O(diameter) rounds. Each round is one shuffle (join + groupBy on
  * vertex id); `localCheckpoint` truncates the plan between rounds so
  * lineage doesn't grow with iteration count. This is the standard
  * large-scale connected-components shape (cf. GraphX/GraphFrames'
  * label propagation); for graphs with huge diameter switch to
  * large-star/small-star, which the same loop skeleton carries.
  */
object GraphOps {

  /** Connected components of an undirected graph given as an edge list
    * (columns `da`, `db`): returns (doc_id, component = min reachable id)
    * for every vertex appearing in an edge. Iterative min-label
    * propagation; one shuffle per round; O(diameter) rounds. */
  def components(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = edgesIn.select($"da", $"db")
      .localCheckpoint() // edges are reused every round: compute once
    val sym = edges.union(edges.select($"db".as("da"), $"da".as("db")))
    var labels = sym.select($"da".as("doc_id")).distinct()
      .withColumn("component", $"doc_id")
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val neighborMin = sym.join(labels, $"da" === $"doc_id")
        .groupBy($"db").agg(min($"component").as("ncomp"))
      val updated = labels
        .join(neighborMin, $"doc_id" === $"db", "left")
        .select($"doc_id", $"component",
          least($"component", coalesce($"ncomp", $"component")).as("next"))
        .localCheckpoint()
      changed = updated.filter($"next" < $"component").count()
      labels = updated.select($"doc_id", $"next".as("component"))
    }
    labels
  }

  /** g01: connected components of the near-dup graph (d02 edges at
    * jaccard ≥ 0.5). */
  def g01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    components(Dedup.jaccardPairs(s, dir, 0.5)).orderBy($"doc_id")
  }

  /** Recursive-CTE mirror: component = min id reachable in the closure. */
  val g01Sql: String =
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT da, db FROM inter
      |          JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      |sym AS (SELECT da, db FROM edges UNION SELECT db, da FROM edges),
      |nodes AS (SELECT DISTINCT da AS doc_id FROM sym),
      |reach(src, dst) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.src, e.db FROM reach r JOIN sym e ON r.dst = e.da)
      |SELECT src AS doc_id, min(dst) AS component
      |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("g01_components", g01, Some(g01Sql), headline = true))
}
