package graft.core

import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite

class YamlSpec extends AnyFunSuite {

  test("parse preserves key order") {
    val m = Yaml.parseMap("b: 1\na: 2\nc:\n  - x\n  - y\n")
    assert(m.keys == Vector("b", "a", "c"))
    assert(m("c") == YList.of(YStr("x"), YStr("y")))
  }

  test("dump emits dbt-style 2-space indent with dash items") {
    val doc = YMap.of(
      "version" -> YInt(2),
      "models" -> YList.of(
        YMap.of("name" -> YStr("orders"), "columns" -> YList.of(
          YMap.of("name" -> YStr("id"), "data_type" -> YStr("integer"))))))
    val out = Yaml.dump(doc)
    assert(out ==
      """version: 2
        |models:
        |  - name: orders
        |    columns:
        |      - name: id
        |        data_type: integer
        |""".stripMargin)
    // round trip
    assert(Yaml.parseMap(out) == doc)
  }

  test("safeUpdate: deep merge, None deletes, siblings preserved") {
    val dest = Yaml.parseMap("a:\n  x: 1\n  y: 2\nb: keep\n")
    val src = YMap.of("a" -> YMap.of("x" -> YInt(9), "z" -> YStr("new"), "y" -> YNull))
    val merged = Merge.safeUpdate(dest, src)
    assert(merged("b") == YStr("keep"))
    val a = merged("a").asMap
    assert(a("x") == YInt(9))
    assert(!a.contains("y"))
    assert(a("z") == YStr("new"))
  }

  test("NamedList round trip with nested keyed lists") {
    val l = Yaml.parse(
      """- name: m1
        |  columns:
        |    - name: id
        |      tests: [unique]
        |- name: m2
        |""".stripMargin)
    val idx = Merge.toIndexed(l).asMap
    assert(idx.keys == Vector("m1", "m2"))
    assert(idx("m1").asMap("columns").asMap.keys == Vector("id"))
    assert(Merge.fromIndexed(idx) == l)
  }

  test("NamedList with custom index field (versions use v)") {
    val l = Yaml.parse("- v: 1\n- v: 2\n  defined_in: custom\n")
    val idx = Merge.toIndexed(l, "v").asMap
    assert(idx.keys == Vector("1", "2"))
    assert(Merge.fromIndexed(idx, "v") == l)
  }
}
