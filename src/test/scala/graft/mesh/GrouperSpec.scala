package graft.mesh

import graft.core.changes._
import graft.core.model._
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite

/** C2/C3 group creation + access patches (`utilities/grouper.py:63-167`;
  * classification truth table mirrors the reference's
  * `tests/unit/test_resource_grouper_classification.py`). */
class GrouperSpec extends AnyFunSuite {

  test("C2 accessChange: Update when patch exists, Add otherwise; group kept") {
    val patched = Fixtures.model("p", "a", "", patchPath = Some("models/_a.yml"))
    val rc1 = Grouper.accessChange(patched, AccessType.Public, Some("g"))
    assert(rc1.op == Operation.Update)
    assert(rc1.path == "models/_a.yml")
    assert(rc1.data == YMap.of("access" -> YStr("public"), "group" -> YStr("g")))

    val bare = Fixtures.model("p", "b", "")
    val rc2 = Grouper.accessChange(bare, AccessType.Private, None)
    assert(rc2.op == Operation.Add)
    assert(rc2.path == "models/_models.yml") // resolve_patch_path default
    assert(rc2.data == YMap.of("access" -> YStr("private")))
  }

  test("C3 addGroup: group YAML + per-model access patches by classification") {
    val m = Fixtures.chain()
    val selected = Set("model.jaffle.stg_orders", "model.jaffle.orders")
    val cs = Grouper.addGroup(m, "core", Owner(name = Some("t")),
      selected, "models/_groups.yml")
    val group = cs.changes.collectFirst {
      case rc: ResourceChange if rc.entityType == EntityType.Group => rc
    }.get
    assert(group.identifier == "core")
    assert(group.data("owner").asMap.get("name").map(_.asStr).contains("t"))
    val access = cs.changes.collect {
      case rc: ResourceChange if rc.entityType == EntityType.Model =>
        rc.identifier -> rc.data("access").asStr
    }
    // orders has a child (report) outside the set -> protected boundary;
    // stg_orders is interior -> private
    assert(access.toMap == Map("orders" -> "protected", "stg_orders" -> "private"))
    access.foreach { case (_, _) => () }
    cs.changes.collect {
      case rc: ResourceChange if rc.entityType == EntityType.Model =>
        assert(rc.data("group") == YStr("core"))
    }
  }

  test("C3 conflict guard: a node in a different group aborts") {
    val base = Fixtures.chain()
    val orders = base.nodes("model.jaffle.orders").copy(group = Some("other"))
    val m = base.copy(nodes = base.nodes.updated(orders.uniqueId, orders))
    intercept[Grouper.GroupConflict](
      Grouper.addGroup(m, "core", Owner(), Set(orders.uniqueId), "models/_groups.yml"))
    // same group is fine
    Grouper.addGroup(m, "other", Owner(), Set(orders.uniqueId), "models/_groups.yml")
  }
}
