package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Runs connect against scratch copies of the reference's source-hack
  * fixture projects — the scenario its `test_connect_command.py` and
  * `test_dependency_detection.py` pin: src_proj_b reads src_proj_a's
  * shared_model through a source stanza (with an UPPER-CASE identifier,
  * exercising case-insensitive relation matching). Skipped when the
  * reference checkout isn't present. */
class ReferenceConnectSpec extends AnyFunSuite with graft.SparkFixture {

  private val base = Paths.get("/root/reference/test-projects/source-hack")

  private def copyTree(from: Path, to: Path): Unit = {
    Files.walk(from).forEach { p =>
      val rel = from.relativize(p)
      val dst = to.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else {
        Files.createDirectories(dst.getParent)
        Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  test("connect resolves the source-hack dependency between the reference fixtures") {
    assume(Files.isDirectory(base), "reference checkout not present")
    val work = Files.createTempDirectory("graft_ref_connect")
    copyTree(base.resolve("src_proj_a"), work.resolve("src_proj_a"))
    copyTree(base.resolve("src_proj_b"), work.resolve("src_proj_b"))

    Main.main(Array("connect", "--projects-dir", work.toString))

    // downstream: source() rewritten to the cross-project ref
    val downstream = Files.readString(
      work.resolve("src_proj_b/models/downstream_model.sql"))
    assert(downstream.contains("{{ ref('src_proj_a', 'shared_model') }}"),
      downstream)
    // the source stanza is gone; the file held only the one source, so it
    // was deleted outright (empty-file cleanup)
    assert(!Files.exists(work.resolve("src_proj_b/models/_sources.yml")))
    // downstream registers the dependency
    assert(Files.readString(work.resolve("src_proj_b/dependencies.yml"))
      .contains("src_proj_a"))
    // upstream boundary model becomes public at the default patch path
    val upYml = Files.readString(
      work.resolve("src_proj_a/models/_models.yml"))
    assert(upYml.contains("shared_model") && upYml.contains("access: public"),
      upYml)

    Files.walk(work).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.delete(p))
  }

  test("the source-hack fixture's on-run-end hook executes when the project runs") {
    assume(Files.isDirectory(base), "reference checkout not present")
    // src_proj_a declares `on-run-end: "select true as col"`
    // (dbt_project.yml:27) — dbt executes it after every run, so graft
    // must too, straight off the unmodified fixture
    val (cfg, manifest) =
      graft.core.parse.ProjectLoader.load(base.resolve("src_proj_a"))
    var hooks = Vector.empty[String]
    val runner = new graft.engine.Runner(spark, manifest, cfg,
      Files.createTempDirectory("graft_ref_hook"), enforceAccess = false,
      onHookRun = h => hooks :+= h)
    val (_, status) = runner.runWithStatus()
    assert(status.values.forall(_ == "success"), status.toString)
    assert(hooks == Vector("select true as col"), hooks.toString)
  }

  test("a 4-project sweep credits the OWNING project, not an installer that matched first") {
    assume(Files.isDirectory(base), "reference checkout not present")
    val work = Files.createTempDirectory("graft_ref_sweep")
    Seq("src_proj_a", "src_proj_b", "dest_proj_a", "dest_proj_b")
      .foreach(p => copyTree(base.resolve(p), work.resolve(p)))

    Main.main(Array("connect", "--projects-dir", work.toString))

    // src_proj_b's source-hack must resolve to src_proj_a (the model's
    // owner), even though dest_proj_a's manifest also carries the
    // installed copy and may pair first in the sweep
    val d = Files.readString(
      work.resolve("src_proj_b/models/downstream_model.sql"))
    assert(d.contains("{{ ref('src_proj_a', 'shared_model') }}"), d)

    Files.walk(work).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.delete(p))
  }

  test("connect resolves the package-import dependencies (dest_proj_a installs src_proj_a)") {
    assume(Files.isDirectory(base), "reference checkout not present")
    val work = Files.createTempDirectory("graft_ref_pkg")
    copyTree(base.resolve("src_proj_a"), work.resolve("src_proj_a"))
    copyTree(base.resolve("dest_proj_a"), work.resolve("dest_proj_a"))

    Main.main(Array("connect", "--projects-dir", work.toString))

    // the reference's test_dependency_detection pins THREE package deps:
    // shared_model -> downstream_model, shared_model -> downstream_model_2,
    // new_model -> downstream_model_2; both files rewrite, and the two
    // rewrites to downstream_model_2 chain on each other's pending text
    val d1 = Files.readString(
      work.resolve("dest_proj_a/models/downstream_model.sql"))
    assert(d1.contains("{{ ref('src_proj_a', 'shared_model') }}"), d1)
    val d2 = Files.readString(
      work.resolve("dest_proj_a/models/downstream_model_2.sql"))
    assert(d2.contains("{{ ref('src_proj_a', 'shared_model') }}"), d2)
    assert(d2.contains("{{ ref('src_proj_a', 'new_model') }}"), d2)
    // upstream: both boundary models public
    val upYml = Files.readString(
      work.resolve("src_proj_a/models/_models.yml"))
    assert(upYml.contains("shared_model") && upYml.contains("new_model"), upYml)
    assert(Files.readString(work.resolve("dest_proj_a/dependencies.yml"))
      .contains("src_proj_a"))

    Files.walk(work).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.delete(p))
  }
}
