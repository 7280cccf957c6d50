package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition-layout story, CI-pinned: results written `partitionBy` a
  * coarse key are read back with partition PRUNING — the filter lands in
  * the scan's PartitionFilters and non-matching directories are never
  * opened. This is the other half of the bucketing spec: bucketing
  * co-locates JOINS, partitioning prunes SCANS — at 100 TB both are
  * decided at write time. */
class PartitionedWriteSpec extends AnyFunSuite with SparkFixture {

  test("partitionBy layout prunes the scan to the filtered partitions") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("part_write").toString
    (1L to 10000L).map(i => (i % 7, i, s"p$i"))
      .toDF("day", "id", "payload")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    // 7 day= directories on disk — the layout IS the index
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dirs.length == 7, s"expected 7 partition dirs, got ${dirs.toSeq}")

    val q = s.read.parquet(dir).filter($"day" === 3L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter not applied at partition level:\n$plan")
    // the row-level filter lists must NOT carry the day predicate — it
    // was consumed by pruning, not evaluated per row
    Seq("PushedFilters", "DataFilters").foreach { kind =>
      val bracket = s"$kind: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
      assert(!bracket.contains("day"),
        s"day predicate leaked into $kind: [$bracket]")
    }
    assert(q.count() == (1L to 10000L).count(_ % 7 == 3))
  }
}
