package graft.mesh

import graft.core.changes.ChangeSetProcessor
import graft.core.parse.ProjectLoader
import graft.core.yaml.Yaml
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Full connect lifecycle — the reference's
  * `tests/integration/test_connect_command.py` shape: two projects wired
  * by a source-hack (downstream declares upstream's model relation as a
  * source), detect the dependency, resolve it into changes, execute, and
  * reload to assert the rewrite + governance landed. */
class ConnectIntegrationSpec extends AnyFunSuite {

  private def writeProject(root: Path, files: Map[String, String]): Unit =
    files.foreach { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }

  test("connect: source-hack detected, rewritten to x-proj ref, source dropped") {
    val upRoot = Files.createTempDirectory("graft_up")
    writeProject(upRoot, Map(
      "dbt_project.yml" -> "name: up_proj\n",
      "models/shared_orders.sql" -> "select 1 as id"))
    val downRoot = Files.createTempDirectory("graft_down")
    writeProject(downRoot, Map(
      "dbt_project.yml" -> "name: down_proj\n",
      "models/__sources.yml" ->
        """version: 2
          |sources:
          |  - name: ext
          |    database: main
          |    schema: main
          |    tables:
          |      - name: shared_orders
          |""".stripMargin,
      "models/consumer.sql" ->
        "select * from {{ source('ext', 'shared_orders') }}"))

    val (_, up) = ProjectLoader.load(upRoot)
    val (_, down) = ProjectLoader.load(downRoot)

    // B2: the shared relation is detected as a Source-type dependency
    val deps = Linker.sourceDependencies(up, down)
    assert(deps.size == 1)
    val dep = deps.head
    assert(dep.upstreamResource == "model.up_proj.shared_orders")
    assert(dep.downstreamResource == "source.down_proj.ext.shared_orders")

    // B5: resolve into per-project plans and execute each against its root
    val plans = Commands.connectPlans(Seq(up, down),
      installs = (_, _) => false, contractData = _ => None,
      readFile = (proj, p) =>
        Files.readString((if (proj == "up_proj") upRoot else downRoot).resolve(p)))
    new ChangeSetProcessor(upRoot).process(Seq(plans("up_proj")))
    new ChangeSetProcessor(downRoot).process(Seq(plans("down_proj")))

    // upstream became public
    val (_, up2) = ProjectLoader.load(upRoot)
    assert(up2.nodes("model.up_proj.shared_orders").access ==
      graft.core.model.AccessType.Public)

    // downstream: consumer reads the cross-project ref, source stanza gone
    val consumer = Files.readString(downRoot.resolve("models/consumer.sql"))
    assert(consumer == "select * from {{ ref('up_proj', 'shared_orders') }}")
    assert(!Files.exists(downRoot.resolve("models/__sources.yml")))

    // dependencies.yml registers the upstream project
    val depYml = Yaml.parseMap(Files.readString(downRoot.resolve("dependencies.yml")))
    assert(depYml("projects").asList.items.head.asMap("name").asStr == "up_proj")

    // reload: consumer now depends on nothing internal (x-proj ref), and
    // the dependency edge is gone from the manifest's source set
    val (_, down2) = ProjectLoader.load(downRoot)
    assert(down2.sources.isEmpty)
  }
}
