package graft.mesh

import graft.core.changes._
import graft.core.model._
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite

/** C8/C9 split planner (`storage/dbt_project_editors.py:171-290`). */
class SubprojectCreatorSpec extends AnyFunSuite {

  private val manifest = Fixtures.chain()

  private val parentFiles: Map[String, String] = Map(
    "models/stg_orders.sql" -> "select * from {{ source('raw', 'orders') }}",
    "models/orders.sql" -> "select * from {{ ref('stg_orders') }}",
    "models/report.sql" -> "select count(*) from {{ ref('orders') }}",
    "models/__models.yml" ->
      """models:
        |  - name: orders
        |    description: mart
        |""".stripMargin,
    "models/staging/__sources.yml" ->
      """sources:
        |  - name: raw
        |    database: main
        |    schema: raw
        |    tables:
        |      - name: orders
        |      - name: payments
        |""".stripMargin)

  private def plan(selected: Set[String]): ChangeSet =
    SubprojectCreator.initialize(manifest, ProjectConfig("jaffle"), "sub",
      selected, "sub_proj", parentFiles)

  test("packages.yml copies into the subproject when the parent has one") {
    val files = parentFiles ++ Map("packages.yml" -> "packages: []\n")
    val cs = SubprojectCreator.initialize(manifest, ProjectConfig("jaffle"),
      "sub", Set("model.jaffle.report"), "sub_proj", files)
    val pkg = cs.changes.collectFirst {
      case fc: FileChange if fc.path == "sub_proj/packages.yml" => fc
    }
    assert(pkg.exists(_.op == Operation.Copy))
    assert(pkg.exists(_.source.contains("packages.yml")))
    // and absent when the parent has none
    val cs2 = SubprojectCreator.initialize(manifest, ProjectConfig("jaffle"),
      "sub", Set("model.jaffle.report"), "sub_proj", parentFiles)
    assert(!cs2.changes.exists {
      case fc: FileChange => fc.path.endsWith("packages.yml"); case _ => false
    })
  }

  test("A9: boundary models are the interface of the selected subgraph") {
    val b = SubprojectCreator.boundaryModels(manifest,
      Set("model.jaffle.stg_orders", "model.jaffle.orders"))
    assert(b == Set("model.jaffle.orders"))
  }

  test("cycle guard: subproject both feeding and consuming parent aborts") {
    // orders alone: consumes stg_orders (parent) and feeds report (parent)
    intercept[SubprojectCreator.ProjectCycle](plan(Set("model.jaffle.orders")))
  }

  test("downstream split: moves files+entries, applies governance, rewrites refs") {
    // orders + report + the exposure move (as `orders+` selection would
    // include descendants); stg_orders stays -> sub consumes parent only
    val cs = plan(Set("model.jaffle.orders", "model.jaffle.report",
      "exposure.jaffle.dash"))

    // scaffold: directory + project file with the new name
    assert(cs.changes.collectFirst { case dc: DirectoryChange => dc.path }
      .contains("sub_proj"))
    val projFile = cs.changes.collectFirst {
      case fc: FileChange if fc.path == "sub_proj/dbt_project.yml" => fc
    }.get
    assert(projFile.data.get.contains("name: sub"))

    // model files move into the subproject tree
    val moves = cs.changes.collect {
      case fc: FileChange if fc.op == Operation.Move => (fc.source.get, fc.path)
    }
    assert(moves.contains("models/orders.sql" -> "sub_proj/models/orders.sql"))
    assert(moves.contains("models/report.sql" -> "sub_proj/models/report.sql"))

    // orders' YAML entry moves: Remove from parent, Add in subproject
    // carrying the parent entry's fields
    val entryAdd = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Model &&
        rc.op == Operation.Add && rc.path.startsWith("sub_proj/") &&
        rc.identifier == "orders" => rc
    }.get
    assert(entryAdd.data.get("description").map(_.asStr).contains("mart"))
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Model &&
        rc.op == Operation.Remove && rc.path == "models/__models.yml" &&
        rc.identifier == "orders"
      case _ => false
    })

    // moved orders rewrites its ref to the parent-owned stg_orders (D8)
    val rewrites = cs.changes.collect {
      case fc: FileChange if fc.op == Operation.Update => fc
    }
    assert(rewrites.exists(_.data.exists(_.contains("{{ ref('jaffle', 'stg_orders') }}"))))

    // parent-side governance: stg_orders becomes public (upstream boundary)
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.identifier == "stg_orders" &&
        rc.data.get("access").exists(_.asStr == "public")
      case _ => false
    })

    // dependency registration: sub depends on parent -> sub's dependencies.yml
    val dep = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Project => rc
    }.get
    assert(dep.identifier == "jaffle")
    assert(dep.path == "sub_proj/dependencies.yml")
  }

  test("upstream split: boundary gets public access, parent registers dependency") {
    // stg_orders + its source move (as `+stg_orders` selection would
    // include ancestors); it feeds orders (parent) -> sub is upstream
    val cs = plan(Set("model.jaffle.stg_orders", "source.jaffle.raw.orders"))
    // boundary governance on the subproject side
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.identifier == "stg_orders" &&
        rc.path.startsWith("sub_proj/") &&
        rc.data.get("access").exists(_.asStr == "public")
      case _ => false
    })
    // parent's dependencies.yml gains the subproject
    val dep = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Project => rc
    }.get
    assert(dep.identifier == "sub")
    assert(dep.path == "dependencies.yml")
    // children left behind rewrite their refs to cross-project form (D7)
    assert(cs.changes.exists {
      case fc: FileChange => fc.path == "models/orders.sql" &&
        fc.data.exists(_.contains("{{ ref('sub', 'stg_orders') }}"))
      case _ => false
    })
  }

  test("source move carries the full stanza config, reduced to one table") {
    val cs = SubprojectCreator.initialize(manifest, ProjectConfig("jaffle"),
      "sub", Set("model.jaffle.stg_orders", "source.jaffle.raw.orders"),
      "sub_proj", parentFiles)
    val add = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Source &&
        rc.op == Operation.Add => rc
    }.get
    assert(add.sourceName.contains("raw"))
    assert(add.data.get("schema").map(_.asStr).contains("raw"))
    val tables = add.data("tables").asList.items.map(_.asMap("name").asStr)
    assert(tables == Vector("orders")) // not payments
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Source &&
        rc.op == Operation.Remove && rc.sourceName.contains("raw")
      case _ => false
    })
  }

  test("indirect groups copy into the subproject; parent config carries over") {
    val base = Fixtures.chain()
    val g = GroupNode("group.jaffle.core", "core", "jaffle",
      "models/_groups.yml", Owner(name = Some("team")))
    val orders = base.nodes("model.jaffle.orders").copy(group = Some("core"))
    val m = base.copy(
      nodes = base.nodes.updated(orders.uniqueId, orders),
      groups = Map(g.uniqueId -> g))
    val files = parentFiles ++ Map(
      "models/_groups.yml" ->
        """groups:
          |  - name: core
          |    owner:
          |      name: team
          |""".stripMargin)
    val cfg = ProjectConfig("jaffle", raw = graft.core.yaml.Yaml.parseMap(
      "name: jaffle\nvars:\n  cutoff: '2024-01-01'\nrequire-dbt-version: '>=1.5.0'\n"))
    val cs = SubprojectCreator.initialize(m, cfg, "sub",
      Set("model.jaffle.orders", "model.jaffle.report", "exposure.jaffle.dash"),
      "sub_proj", files)
    // group entry copied (Add) into the subproject, parent untouched
    val groupAdd = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Group => rc
    }.get
    assert(groupAdd.op == Operation.Add)
    assert(groupAdd.path == "sub_proj/models/_groups.yml")
    assert(groupAdd.data.get("owner").exists(_.asMap.get("name")
      .exists(_.asStr == "team")))
    // project file carries vars + require-dbt-version
    val projFile = cs.changes.collectFirst {
      case fc: FileChange if fc.path == "sub_proj/dbt_project.yml" => fc
    }.get
    assert(projFile.data.get.contains("cutoff"))
    assert(projFile.data.get.contains(">=1.5.0"))
  }

  test("macro closure moves only the needed block from a shared macro file") {
    // orders uses helper(); the shared file also defines unrelated()
    val base = Fixtures.chain()
    val helper = MacroNode("macro.jaffle.helper", "helper", "jaffle",
      "macros/shared.sql", "{{ x }} + 1")
    val orders = base.nodes("model.jaffle.orders").copy(
      dependsOn = base.nodes("model.jaffle.orders").dependsOn.copy(
        macros = Vector(helper.uniqueId)))
    val m = base.copy(
      nodes = base.nodes.updated(orders.uniqueId, orders),
      macros = Map(helper.uniqueId -> helper))
    val files = parentFiles ++ Map(
      "macros/shared.sql" ->
        ("{% macro helper(x) %}{{ x }} + 1{% endmacro %}\n" +
          "{% macro unrelated() %}2{% endmacro %}\n"))
    val cs = SubprojectCreator.initialize(m, ProjectConfig("jaffle"), "sub",
      Set("model.jaffle.orders", "model.jaffle.report", "exposure.jaffle.dash"),
      "sub_proj", files)
    val macroChange = cs.changes.collectFirst {
      case fc: FileChange if fc.path == "sub_proj/macros/shared.sql" => fc
    }.get
    assert(macroChange.op == Operation.Append)
    assert(macroChange.data.get.contains("macro helper"))
    assert(!macroChange.data.get.contains("unrelated"))
  }

  test("unreadable source entry skips the move instead of fabricating a stub") {
    val noSourceYaml = parentFiles - "models/staging/__sources.yml"
    val cs = SubprojectCreator.initialize(manifest, ProjectConfig("jaffle"),
      "sub", Set("model.jaffle.stg_orders", "source.jaffle.raw.orders"),
      "sub_proj", p => noSourceYaml(p))
    assert(!cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Source
      case _ => false
    })
  }
}
