package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // 2-arg form (driver contract) dumps every query; an optional third
    // arg restricts to comma-separated name PREFIXES for fast local
    // iteration (matching Bench's SPARK_GRAFT_ONLY semantics: "d,g21"
    // selects every d-family query plus g21).
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, Set.empty[String])
      case Array(s, o, sel)  => (s, o, sel.split(',').toSet)
      case _ =>
        System.err.println(
          "usage: graft.Verify <sfDir> <outDir> [name1,name2,...]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // keep the posting-list CappedCollect aggregation on the hash path
      // (same setting and rationale as Bench; buffers are cap-bounded)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nFailed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce propagates a 1-task
      // constraint up an entire shuffle-free pipeline (the codec/text
      // kernel queries run on one of the 32 cores); the extra tiny
      // shuffle of the final rows is irrelevant to the sorted-rows
      // oracle compare
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        nFailed += 1
        // a failure BEFORE the overwrite kicked in leaves the PREVIOUS
        // run's parquet in place — localverify would read the stale dir
        // and report a silent PASS on a broken query; delete it so the
        // gate reads red
        val stale = Paths.get(s"$outDir/$name")
        if (Files.exists(stale)) {
          import scala.jdk.CollectionConverters._
          Files.walk(stale).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
        }
      }
      // release this query's lazy-checkpoint blocks (same accumulation
      // Bench hit: 160+ queries of retained MEMORY_AND_DISK blocks force
      // spills on the later checkpoint-heavy queries; blocks are never
      // shared across queries)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.exists(k.startsWith) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // a nonzero exit makes a failed dump unmissable even when only the
    // tail of stdout/stderr is captured
    if (nFailed > 0) {
      System.err.println(s"[verify] $nFailed quer${if (nFailed == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
