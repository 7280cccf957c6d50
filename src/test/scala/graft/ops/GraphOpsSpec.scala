package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The components operator on synthetic graphs, exercised through BOTH
  * physical strategies — the single-task union-find local finish (the
  * default for small candidate graphs) and the distributed min-label
  * propagation loop (forced via localFinishEdges = 0) — which must agree
  * everywhere: convergence over long diameters, disjoint components,
  * isolated-vertex exclusion, order/direction invariance. */
class GraphOpsSpec extends AnyFunSuite with SparkFixture {

  private def runBoth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val df = edges.toDF("da", "db")
    val localDf = GraphOps.components(df)
    val loopDf = GraphOps.components(df, localFinishEdges = 0L)
    // the schema must not depend on which strategy the threshold picked —
    // downstream unions/joins would see type drift otherwise
    assert(localDf.schema == loopDf.schema,
      s"strategy-dependent schema: ${localDf.schema} vs ${loopDf.schema}")
    val local = localDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = loopDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == loop, "union-find and propagation strategies disagree")
    local
  }

  test("nullable edge input yields identical non-nullable schemas on both strategies") {
    val s = spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // explicitly-nullable schema — the shape of parquet-derived edges
    val schema = StructType(Seq(
      StructField("da", LongType, nullable = true),
      StructField("db", LongType, nullable = true)))
    val df = s.createDataFrame(
      s.sparkContext.parallelize(Seq(Row(1L, 2L), Row(2L, 3L), Row(5L, 6L))),
      schema)
    assert(df.schema.fields.forall(_.nullable), "precondition: input nullable")
    val localDf = GraphOps.components(df)
    val loopDf = GraphOps.components(df, localFinishEdges = 0L)
    assert(localDf.schema == loopDf.schema,
      s"nullability drift: ${localDf.schema} vs ${loopDf.schema}")
    assert(localDf.schema.fields.forall(!_.nullable))
  }

  test("int-typed edges yield the same long schema on both strategies") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2), (2, 3)).toDF("da", "db") // IntegerType input
    val localDf = GraphOps.components(df)
    val loopDf = GraphOps.components(df, localFinishEdges = 0L)
    assert(localDf.schema == loopDf.schema)
    assert(localDf.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType))
  }

  test("a long path converges to one component (diameter >> 1 round)") {
    // path 10-11-12-...-29: diameter 19, forces many propagation rounds
    val path = (10L until 29L).map(i => (i, i + 1))
    val comps = runBoth(path)
    assert(comps.size == 20)
    assert(comps.values.toSet == Set(10L))
  }

  test("disjoint components get distinct min labels") {
    val comps = runBoth(Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L)))
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 9L -> 7L,
      20L -> 20L, 21L -> 20L))
  }

  test("edge order and direction don't matter") {
    val a = runBoth(Seq((5L, 3L), (3L, 8L)))
    val b = runBoth(Seq((8L, 3L), (5L, 3L)))
    assert(a == b)
    assert(a.values.toSet == Set(3L))
  }

  test("a binary-tree component and self-loops resolve to the root min") {
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L), (3L, 7L))
    val comps = runBoth(tree :+ (7L -> 7L))
    assert(comps.values.toSet == Set(1L))
    assert(comps.size == 7)
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.triangles(edges.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every vertex sits in 3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(runTriangles(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a chain has vertices but zero triangles") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(runTriangles(chain) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("triangle with a pendant vertex: pendant counts zero") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    assert(runTriangles(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 0L))
  }

  test("LPA splits a bridged barbell that components merge; ties break to min label") {
    val s = spark
    import s.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4: one
    // connected component, but the dense groups are separate communities.
    // Hand-simulated 4 synchronous rounds (neighbor-majority, min-label
    // tiebreak): {1,2,3} -> 1, {4,5,6} -> 3.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L)
    // both physical strategies (single-task local finish and the
    // distributed loop) must apply the identical synchronous update
    val local = GraphOps.labelPropagation(g.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = GraphOps.labelPropagation(g.toDF("da", "db"),
        localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected, local)
    assert(loop == expected, loop)
    // components on the same graph: ONE cluster — LPA is the finer grain
    val comp = GraphOps.components(g.toDF("da", "db"))
      .collect().map(_.getLong(1)).distinct
    assert(comp.length == 1)
  }

  test("clustering coefficient: K4 is all 1.0, pendant 0, hinge 1/3") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3} with pendant 9 on vertex 3:
    //  1,2: deg 2, 1 triangle → 2·1/(2·1) = 1.0
    //  3:   deg 3, 1 triangle → 2·1/(3·2) = 0.333333
    //  9:   deg 1 → defined 0.0
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    val got = GraphOps.clusteringCoefficient(g.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 1L, 0.333333)), 9L -> ((1L, 0L, 0.0))))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val coeffs = GraphOps.clusteringCoefficient(k4.toDF("da", "db"))
      .collect().map(_.getDouble(3))
    assert(coeffs.forall(_ == 1.0), "every K4 vertex neighborhood is a clique")
  }

  // ------------------------------------------------------------ pagerank

  /** Brute-force integer PageRank mirroring the operator's fixed-point
    * arithmetic exactly (same symmetrization, same floor divisions). */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    val S = 1000000000000L
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val contrib = rank.map { case (v, r) => v -> r / deg(v) }
      val in = sym.groupBy(_._2).view
        .mapValues(_.map(e => contrib(e._1)).sum).toMap
      rank = deg.keys.map(v =>
        v -> (15L * S / 100 + 85L * in.getOrElse(v, 0L) / 100)).toMap
    }
    rank
  }

  private def runPagerank(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.pagerank(edges.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pagerank on a path: center outranks the ends, exact integer match") {
    val got = runPagerank(Seq((1L, 2L), (2L, 3L)))
    assert(got == refPagerank(Seq((1L, 2L), (2L, 3L))))
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("pagerank on a star: the hub dominates the leaves") {
    val star = (2L to 6L).map(v => (1L, v))
    val got = runPagerank(star)
    assert(got == refPagerank(star))
    val leaves = (2L to 6L).map(got)
    assert(leaves.forall(_ == leaves.head), "leaves must tie exactly")
    assert(got(1L) > leaves.head * 2, "hub should dominate")
  }

  test("pagerank matches the brute-force reference on random graphs") {
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 5) {
      val n = 4 + rnd.nextInt(8)
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)).toSeq
      if (edges.nonEmpty) assert(runPagerank(edges) == refPagerank(edges))
    }
  }

  private def runKcore(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.kcore(edges.toDF("da", "db")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("2-core dissolves a star but keeps a triangle") {
    // star 1-{2,3,4}: all leaves have degree 1 → round 1 peels them,
    // the hub's edges vanish with them → empty core. The triangle
    // 5-6-7 survives untouched with degree 2 everywhere.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
    assert(runKcore(edges) == Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("2-core peels a pendant chain off a cycle within 3 rounds") {
    // cycle 1-2-3-4-1 with tail 4-5-6-7: round 1 drops 7, round 2 drops
    // 6, round 3 drops 5 — the cycle remains, tail gone
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L))
    assert(runKcore(edges) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("K4 minus an edge: every vertex still sits in the 2-core") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(runKcore(edges) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L))
  }

  test("kcore: local-finish and distributed peel agree on cascading graphs") {
    val s = spark
    import s.implicits._
    // star (full cascade to empty) + triangle (stable) + pendant chain
    // (one peel per round) — exercises every per-round outcome
    val graphs = Seq(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L), (5L, 7L)),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)),
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    graphs.foreach { edges =>
      val df = edges.toDF("da", "db")
      val local = GraphOps.kcore(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = GraphOps.kcore(df, localFinishEdges = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == loop, s"strategies disagree on $edges")
    }
  }

  private def runBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.bfsHops(edges.toDF("da", "db"), seeds.toDF("doc_id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfs on a path seeded at one end: hop = distance, cut at maxHops") {
    // 1-2-3-4-5-6: seed 1, maxHops 3 → 5 and 6 unreachable within bound
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(runBfs(edges, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfs takes the MIN over multiple paths and seeds") {
    // cycle 1-2-3-4-1 seeded at 1 and 3: everything is ≤1 hop away;
    // vertex 9 in a separate component never appears
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (8L, 9L))
    assert(runBfs(edges, Seq(1L, 3L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("bfs seeds outside the edge set stay at hop 0 with no expansion") {
    val edges = Seq((1L, 2L))
    assert(runBfs(edges, Seq(7L), 2) == Map(7L -> 0L))
  }

  test("bipartite overlap: pair counts, totals, and the overlap coefficient") {
    val s = spark
    import s.implicits._
    // A: {u1,u2,u3}, B: {u2,u3}, C: {u3}; u1 logs A twice (dup must not count)
    val members = Seq(
      (1L, "A"), (1L, "A"), (2L, "A"), (3L, "A"),
      (2L, "B"), (3L, "B"),
      (3L, "C")).toDF("user_id", "event_type")
    val out = GraphOps.bipartiteOverlap(members).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // (et_a, et_b) sorted lexicographically; overlap = n_both/min(na,nb)
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 3L, 2L, 1.0),   // B ⊂ A → overlap 1
      ("A", "C", 1L, 3L, 1L, 1.0),   // C ⊂ A → overlap 1
      ("B", "C", 1L, 2L, 1L, 1.0)))  // C ⊂ B → overlap 1
  }

  test("bipartite overlap: partial overlap gives a fractional coefficient") {
    val s = spark
    import s.implicits._
    // X: {u1,u2}, Y: {u2,u3,u4} → ∩={u2}, min(|X|,|Y|)=2 → 0.5
    val members = Seq(
      (1L, "X"), (2L, "X"),
      (2L, "Y"), (3L, "Y"), (4L, "Y")).toDF("user_id", "event_type")
    val out = GraphOps.bipartiteOverlap(members).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)) ==
      (("X", "Y", 1L, 0.5)))
  }

  /** (n_edges, assortativity-or-null) of an edge list. */
  private def assortOf(edges: Seq[(Long, Long)]): (Long, Option[Double]) = {
    val s = spark
    import s.implicits._
    val r = GraphOps.assortativity(edges.toDF("da", "db")).collect().head
    (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
  }

  test("assortativity: a star is perfectly disassortative (r = -1)") {
    assert(assortOf(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L)) == ((3L, Some(-1.0))))
  }

  test("assortativity: path P4 scores -0.5 (hand-computed moments)") {
    // degrees 1,2,2,1; stubs (1,2)x2,(2,1)x2,(2,2)x2 → r = -4/8
    assert(assortOf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)) == ((3L, Some(-0.5))))
  }

  test("assortativity: a regular graph has zero degree variance → null r") {
    // C4 cycle: every degree 2, denominator 0 → undefined, emitted null
    assert(assortOf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) ==
      ((4L, None)))
  }

  /** (n_edges, intra_edges, n_sources, modularity) for an edge list and
    * a doc_id→source labeling. */
  private def modOf(edges: Seq[(Long, Long)], srcs: Map[Long, String])
      : (Long, Long, Long, Double) = {
    val s = spark
    import s.implicits._
    val docs = srcs.toSeq.toDF("doc_id", "source")
    val r = GraphOps.sourceModularity(edges.toDF("da", "db"), docs)
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("modularity: two source-pure components score the 0.5 maximum") {
    assert(modOf(Seq(1L -> 2L, 3L -> 4L),
      Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B")) ==
      ((2L, 2L, 2L, 0.5)))
  }

  test("modularity: all-cross-source edges score -0.5") {
    assert(modOf(Seq(1L -> 2L, 3L -> 4L),
      Map(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B")) ==
      ((2L, 0L, 2L, -0.5)))
  }

  test("modularity: a single source is the degenerate 0 partition") {
    assert(modOf(Seq(1L -> 2L), Map(1L -> "A", 2L -> "A")) ==
      ((1L, 1L, 1L, 0.0)))
  }

  /** (n_edges, n_wedges, n_triangles, ppm-or-null) of an edge list. */
  private def transOf(edges: Seq[(Long, Long)]): (Long, Long, Long, Option[Long]) = {
    val s = spark
    import s.implicits._
    val r = GraphOps.transitivityOf(edges.toDF("da", "db")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("transitivity: a triangle closes all three of its wedges") {
    assert(transOf(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)) ==
      ((3L, 3L, 1L, Some(1000000L))))
  }

  test("transitivity: a star has C(k,2) wedges and no closure") {
    assert(transOf(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L)) ==
      ((3L, 3L, 0L, Some(0L))))
  }

  test("transitivity: K4 minus one edge — 6 of 8 wedges close (750000 ppm)") {
    // degrees 3,3,2,2 → wedges 3+3+1+1 = 8; triangles {1,2,3},{1,2,4}
    assert(transOf(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L)) ==
      ((5L, 8L, 2L, Some(750000L))))
  }

  test("transitivity: a single edge has no wedges — ratio is null") {
    assert(transOf(Seq(1L -> 2L)) == ((1L, 0L, 0L, None)))
  }

  test("edge support: triangle edges corroborate, the pendant edge is a bridge") {
    val s2 = spark
    import s2.implicits._
    // triangle 1-2-3 plus pendant edge 3-4: every triangle edge has
    // support 1; (3,4) rests on a single uncorroborated match
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L).toDF("da", "db")
    val out = GraphOps.edgeSupport(edges).orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, 2L, 1L, false), (1L, 3L, 1L, false),
      (2L, 3L, 1L, false), (3L, 4L, 0L, true)))
  }

  test("edge support: K4 — every edge sits in two triangles") {
    val s2 = spark
    import s2.implicits._
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
      .toDF("da", "db")
    val out = GraphOps.edgeSupport(edges).collect()
      .map(r => (r.getLong(2), r.getBoolean(3))).toSeq
    assert(out.size == 6 && out.forall(_ == ((2L, false))))
  }

  test("incremental components: contracted merge equals full recompute on a hand graph") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions.{coalesce, least, greatest}
    // old graph (even ids): {2,4} and {6,8}; batch edges: the new odd
    // vertex 7 bridges both old components (4-7, 6-7), and 8-9 chains in
    // a second new vertex
    val pairs = Seq(2L -> 4L, 6L -> 8L, 4L -> 7L, 6L -> 7L, 8L -> 9L).toDF("da", "db")
    val oldE = pairs.filter($"da" % 2 === 0 && $"db" % 2 === 0)
    val batchE = pairs.filter($"da" % 2 === 1 || $"db" % 2 === 1)
    // replicate g18's incremental composition on the hand graph
    val oldLab = GraphOps.components(oldE)
    val contracted = batchE
      .join(oldLab.select($"doc_id".as("da"), $"component".as("la")), Seq("da"), "left")
      .join(oldLab.select($"doc_id".as("db"), $"component".as("lb")), Seq("db"), "left")
      .select(coalesce($"la", $"da").as("x"), coalesce($"lb", $"db").as("y"))
      .filter($"x" =!= $"y")
      .select(least($"x", $"y").as("da"), greatest($"x", $"y").as("db")).distinct()
    val merged = GraphOps.components(contracted)
    val verts = pairs.select($"da".as("doc_id")).union(pairs.select($"db".as("doc_id"))).distinct()
    val incr = verts
      .join(oldLab.select($"doc_id", $"component".as("oldc")), Seq("doc_id"), "left")
      .withColumn("c0", coalesce($"oldc", $"doc_id"))
      .join(merged.select($"doc_id".as("cv"), $"component".as("c1")), $"c0" === $"cv", "left")
      .select($"doc_id", coalesce($"c1", $"c0").as("component"))
    val full = GraphOps.components(pairs)
    val a = incr.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = full.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(a.forall(_._2 == 2L)) // one merged cluster labeled by the global min
  }
}
