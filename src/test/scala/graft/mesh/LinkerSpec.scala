package graft.mesh

import graft.core.changes._
import graft.core.model._
import org.scalatest.funsuite.AnyFunSuite

/** B1–B5 cross-project linking (`utilities/linker.py`; expected shapes
  * from the reference's `tests/integration/test_dependency_detection.py`). */
class LinkerSpec extends AnyFunSuite {

  /** upstream project exposing model `shared` at relation main.up.shared. */
  private val up: Manifest = {
    val shared = Fixtures.model("up", "shared", "select 1",
      relation = Some("MAIN.up.shared")) // case-insensitive matching
    Manifest("up", nodes = Map(shared.uniqueId -> shared))
  }

  /** downstream consumes it via a source-hack (source with same relation). */
  private val downSource: Manifest = {
    val src = SourceDefinition("source.down.ext.shared", "shared", "ext",
      "down", "models/__sources.yml", relationName = Some("main.up.shared"))
    val consumer = Fixtures.model("down", "consumer",
      "select * from {{ source('ext', 'shared') }}", deps = Seq(src.uniqueId))
    Manifest("down",
      nodes = Map(consumer.uniqueId -> consumer),
      sources = Map(src.uniqueId -> src))
  }

  /** downstream installs up as a package: proxy node with same relation. */
  private val downPackage: Manifest = {
    val proxy = Fixtures.model("down", "shared", "select 1",
      relation = Some("main.up.shared"))
    val child = Fixtures.model("down", "child",
      "select * from {{ ref('shared') }}", deps = Seq(proxy.uniqueId))
    Manifest("down", nodes = Map(proxy.uniqueId -> proxy, child.uniqueId -> child))
  }

  test("B1: relation intersection is case-insensitive") {
    assert(Linker.relationIntersection(up, downSource) == Set("main.up.shared"))
  }

  test("B2: source-hack dependency detected in the right direction") {
    val deps = Linker.sourceDependencies(up, downSource)
    assert(deps == Set(Linker.ProjectDependency(
      "model.up.shared", "up", "source.down.ext.shared", "down",
      Linker.DependencyType.Source)))
    // symmetric call order finds the same dependency
    assert(Linker.sourceDependencies(downSource, up) == deps)
  }

  test("B3: package dependency fans out to each child of the proxy") {
    val deps = Linker.packageDependencies(up, downPackage)
    assert(deps == Set(Linker.ProjectDependency(
      "model.up.shared", "up", "model.down.child", "down",
      Linker.DependencyType.Package)))
  }

  test("B4: pairwise sweep honors installs flags and dedups") {
    val both = Linker.dependencies(Seq((up, false), (downPackage, true)))
    assert(both.exists(_.depType == Linker.DependencyType.Package))
    val none = Linker.dependencies(Seq((up, false), (downPackage, false)))
    assert(!none.exists(_.depType == Linker.DependencyType.Package))
  }

  test("B5: resolving a source dependency rewrites children, drops the stanza, registers the dep") {
    val dep = Linker.sourceDependencies(up, downSource).head
    val files = Map(
      ("down", "models/consumer.sql") ->
        "select * from {{ source('ext', 'shared') }}")
    val cs = Linker.resolveDependency(dep, up, downSource, None,
      (proj, p) => files((proj, p)))

    // upstream made public
    val access = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Model &&
        rc.identifier == "shared" => rc
    }.get
    assert(access.data("access").asStr == "public")

    // consumer's source() became a cross-project ref()
    val rewrite = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(rewrite.path == "models/consumer.sql")
    assert(rewrite.data.get == "select * from {{ ref('up', 'shared') }}")

    // source stanza removed
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Source &&
        rc.op == Operation.Remove && rc.sourceName.contains("ext")
      case _ => false
    })

    // dependencies.yml gains the upstream project
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Project &&
        rc.identifier == "up" && rc.path == "dependencies.yml"
      case _ => false
    })
  }
}
