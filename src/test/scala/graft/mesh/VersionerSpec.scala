package graft.mesh

import graft.core.changes._
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite

/** C4–C6 versioning (`utilities/versioner.py`; splice semantics pinned by
  * the reference's `tests/sql_and_yml_fixtures.py:215-276`). */
class VersionerSpec extends AnyFunSuite {

  private val model = Fixtures.model("jaffle", "orders", "select 1",
    patchPath = Some("models/__models.yml"))

  private def versionsEntry(vs: Long*): YMap =
    YMap.of("name" -> YStr("orders"),
      "latest_version" -> YInt(vs.max),
      "versions" -> YList(vs.toVector.map(v => YMap.of("v" -> YInt(v)): Y)))

  test("latestModelVersion: max of ints, None when unversioned, int-only") {
    assert(Versioner.latestModelVersion(versionsEntry(1, 2)) == Some(2))
    assert(Versioner.latestModelVersion(YMap.empty).isEmpty)
    val bad = YMap.of("versions" -> YList.of(YMap.of("v" -> YStr("2.0"))))
    intercept[Versioner.NonIntegerVersion](Versioner.latestModelVersion(bad))
  }

  test("C4 addVersion: patch {latest_version:1, versions:[{v:1}]} + Move to _v1") {
    val cs = Versioner.addVersion(model, YMap.of("name" -> YStr("orders")))
    val patch = cs.changes.collectFirst { case rc: ResourceChange => rc }.get
    assert(patch.op == Operation.Update) // patchPath exists
    assert(patch.data("latest_version") == YInt(1))
    assert(patch.data("versions").asList.items == Vector(YMap.of("v" -> YInt(1))))
    val mv = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(mv.op == Operation.Move)
    assert(mv.path == "models/orders_v1.sql")
    assert(mv.source.contains("models/orders.sql"))
  }

  test("C4 addVersion with defined_in keeps the custom file name") {
    val cs = Versioner.addVersion(model, YMap.empty, definedIn = Some("orders_base"))
    val mv = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(mv.path == "models/orders_base.sql")
    val patch = cs.changes.collectFirst { case rc: ResourceChange => rc }.get
    val v1 = patch.data("versions").asList.items.head.asMap
    assert(v1.get("defined_in").map(_.asStr).contains("orders_base"))
  }

  test("C4 addVersion refuses an already-versioned model") {
    intercept[IllegalArgumentException](
      Versioner.addVersion(model, versionsEntry(1)))
  }

  test("C5 bumpVersion behaviors: Prerelease keeps, Increment +1, Latest = new max") {
    def latestAfter(b: Versioner.Behavior): Y = {
      val cs = Versioner.bumpVersion(model, versionsEntry(1, 2), b, "models/orders_v2.sql")
      cs.changes.collectFirst { case rc: ResourceChange => rc }.get.data("latest_version")
    }
    assert(latestAfter(Versioner.Behavior.Prerelease) == YInt(2))
    assert(latestAfter(Versioner.Behavior.Increment) == YInt(3))
    assert(latestAfter(Versioner.Behavior.Latest) == YInt(3))
  }

  test("C5 bumpVersion appends {v: max+1} and Copies the current latest file") {
    val cs = Versioner.bumpVersion(model, versionsEntry(1, 2),
      Versioner.Behavior.Latest, "models/orders_v2.sql")
    val patch = cs.changes.collectFirst { case rc: ResourceChange => rc }.get
    assert(patch.data("versions").asList.items.map(_.asMap("v")) ==
      Vector(YInt(1), YInt(2), YInt(3)))
    val cp = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(cp.op == Operation.Copy)
    assert(cp.path == "models/orders_v3.sql")
    assert(cp.source.contains("models/orders_v2.sql"))
  }

  test("C6 version splice: unversioned → one patch with v1+v2, Move then Copy") {
    val cs = Versioner.version(model, YMap.of("name" -> YStr("orders")),
      Versioner.Behavior.Latest)
    val patches = cs.changes.collect { case rc: ResourceChange => rc }
    assert(patches.size == 1) // the two model patches dedup into one
    val data = patches.head.data
    assert(data("latest_version") == YInt(2))
    assert(data("versions").asList.items.map(_.asMap("v")) == Vector(YInt(1), YInt(2)))
    val fcs = cs.changes.collect { case fc: FileChange => fc }
    assert(fcs.map(_.op) == Vector(Operation.Move, Operation.Copy))
    // bump's Copy reads the just-moved v1 file
    assert(fcs(0).path == "models/orders_v1.sql")
    assert(fcs(1).source.contains("models/orders_v1.sql"))
    assert(fcs(1).path == "models/orders_v2.sql")
  }

  test("C6 version on an already-versioned model just bumps") {
    val cs = Versioner.version(model, versionsEntry(1), Versioner.Behavior.Increment)
    val fcs = cs.changes.collect { case fc: FileChange => fc }
    assert(fcs.map(_.op) == Vector(Operation.Copy))
    assert(fcs.head.source.contains("models/orders_v1.sql"))
    assert(fcs.head.path == "models/orders_v2.sql")
  }

  test("C5 bump with defined_in: version entry carries it, copy uses the name " +
    "(reference fixture expected_versioned_model_yml_prerelease_defined_in)") {
    val cs = Versioner.bumpVersion(model, versionsEntry(1),
      Versioner.Behavior.Prerelease, "models/orders_v1.sql",
      definedIn = Some("daves_model"))
    val patch = cs.changes.collectFirst { case rc: ResourceChange => rc }.get
    // prerelease keeps latest_version at 1
    assert(patch.data("latest_version") == YInt(1))
    val versions = patch.data("versions").asList.items
    assert(versions.map(_.asMap("v")) == Vector(YInt(1), YInt(2)))
    assert(versions.last.asMap.get("defined_in").contains(YStr("daves_model")))
    val cp = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(cp.path == "models/daves_model.sql")
  }

  test("versioned file extension follows the model language (python model)") {
    val py = Fixtures.model("jaffle", "histories", "import dbt",
      patchPath = Some("models/__models.yml"), language = "python")
    val cs = Versioner.addVersion(py, YMap.of("name" -> YStr("histories")))
    val mv = cs.changes.collectFirst { case fc: FileChange => fc }.get
    assert(mv.path == "models/histories_v1.py")
  }
}
