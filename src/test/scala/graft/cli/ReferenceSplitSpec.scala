package graft.cli

import graft.core.parse.ProjectLoader
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Runs the split command against a scratch COPY of the reference's own
  * jaffle-shop fixture — the same scenario as the reference's
  * `test_split_command.py::test_split_one_model` family, driven through
  * our CLI. Skipped when the reference checkout isn't present. */
class ReferenceSplitSpec extends AnyFunSuite {

  private val src = Paths.get("/root/reference/test-projects/split/split_proj")

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

  test("split +stg_orders out of the reference fixture via the CLI") {
    assume(Files.isDirectory(src), "reference checkout not present")
    val work = Files.createTempDirectory("graft_ref_split")
    copyTree(src, work)

    Main.main(Array("split", "my_new_project",
      "--select", "+stg_orders",
      "--project-dir", work.toString,
      "--target-dir", "my_new_project"))

    val sub = work.resolve("my_new_project")
    // the selected model and its upstream seed sources moved
    assert(Files.exists(sub.resolve("models/staging/stg_orders.sql")))
    assert(!Files.exists(work.resolve("models/staging/stg_orders.sql")))
    // the parent's downstream mart now references the subproject
    val ordersSql =
      Files.readString(work.resolve("models/marts/orders.sql"))
    assert(ordersSql.contains("{{ ref('my_new_project', 'stg_orders') }}"),
      ordersSql.linesIterator.take(25).mkString("\n"))
    // boundary governance: the moved model is public in the subproject
    // (stg_orders has no patch in the fixture, so the access patch lands
    // in the model dir's default _models.yml, like resolve_patch_path)
    val stgYml = Files.readString(sub.resolve("models/staging/_models.yml"))
    assert(stgYml.contains("access: public"), stgYml)
    // the parent registers the dependency on the new upstream project
    assert(Files.exists(work.resolve("dependencies.yml")))
    assert(Files.readString(work.resolve("dependencies.yml"))
      .contains("my_new_project"))
    // both sides reload as valid projects
    val (_, parentM) = ProjectLoader.load(work)
    val (_, subM) = ProjectLoader.load(sub)
    assert(subM.nodes.contains("model.my_new_project.stg_orders"))
    assert(parentM.nodes.contains("model.split_proj.orders"))

    Files.walk(work).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.delete(p))
  }
}
