package graft.mesh

import graft.SparkFixture
import graft.core.changes._
import graft.core.model.Owner
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite

/** §3.2 `group` command: contracts are planned for exactly the models
  * whose PLANNED access is non-private — derived from the pending
  * ChangeSet, not from written state. */
class CommandsSpec extends AnyFunSuite with SparkFixture {

  test("group plans access for all, contracts only for the boundary") {
    val s = spark
    import s.implicits._
    val m = Fixtures.chain()
    // materialize the boundary model's schema as its view
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("jaffle__orders")
    Seq((1L, 2L)).toDF("id", "c").createOrReplaceTempView("jaffle__stg_orders")

    val cs = Commands.group(s, m, "core", Owner(name = Some("t")),
      Set("model.jaffle.stg_orders", "model.jaffle.orders"),
      "models/_groups.yml", name => s"jaffle__$name")

    // the group itself + two access patches
    assert(cs.changes.exists {
      case rc: ResourceChange => rc.entityType == EntityType.Group
      case _ => false
    })
    val accessByModel = cs.changes.collect {
      case rc: ResourceChange if rc.entityType == EntityType.Model &&
        rc.data.contains("access") => rc.identifier -> rc.data("access").asStr
    }.toMap
    assert(accessByModel == Map("orders" -> "protected", "stg_orders" -> "private"))

    // contract planned ONLY for the protected boundary model, with the
    // schema of its materialized view
    val contracts = cs.changes.collect {
      case rc: ResourceChange if rc.entityType == EntityType.Model &&
        rc.data.contains("columns") => rc
    }
    assert(contracts.map(_.identifier) == Vector("orders"))
    val cols = contracts.head.data("columns").asList.items.map(_.asMap)
    assert(cols.map(_.apply("name").asStr) == Vector("id", "v"))
    // Spark typeName vocabulary (parseType round-trips long <-> bigint)
    assert(cols.map(_.apply("data_type").asStr) == Vector("long", "string"))
    val enforced = contracts.head.data("config").asMap("contract")
      .asMap("enforced")
    assert(enforced == YBool(true))
  }
}
