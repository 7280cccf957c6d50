package graft.core

import graft.core.graph.{Dag, Selector}
import graft.core.model._
import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {

  // hand graph mirroring tests/unit/test_resource_grouper_classification.py
  //   a -> b -> c ; b -> t (test); c is leaf
  val child: Map[String, Set[String]] = Map(
    "model.p.a" -> Set("model.p.b"),
    "model.p.b" -> Set("model.p.c", "test.p.t"),
    "model.p.c" -> Set.empty[String]).withDefaultValue(Set.empty)
  val parent: Map[String, Set[String]] = Map(
    "model.p.b" -> Set("model.p.a"),
    "model.p.c" -> Set("model.p.b"),
    "test.p.t" -> Set("model.p.b")).withDefaultValue(Set.empty)

  test("interface = edge-boundary sources plus leaves") {
    val sel = Set("model.p.a", "model.p.b")
    assert(Dag.identifyInterface(Dag.cleanSubgraph(child), sel) == Set("model.p.b"))
    val all = Set("model.p.a", "model.p.b", "model.p.c")
    // c is a leaf -> interface even with no departing edge
    assert(Dag.identifyInterface(Dag.cleanSubgraph(child), all).contains("model.p.c"))
  }

  test("classification: boundary protected, interior private") {
    val cls = Dag.classifyAccess(child, Set("model.p.a", "model.p.b"))
    assert(cls("model.p.b") == AccessType.Protected)
    assert(cls("model.p.a") == AccessType.Private)
  }

  test("test nodes never make a model protected") {
    // b's only departing edges: c (outside) and t (test). With c selected
    // too, only the test edge leaves -> b must be private, c protected leaf
    val cls = Dag.classifyAccess(child, Set("model.p.a", "model.p.b", "model.p.c", "test.p.t"))
    assert(cls("model.p.b") == AccessType.Private)
    assert(cls("model.p.c") == AccessType.Protected)
    assert(!cls.contains("test.p.t"))
  }

  test("cycle detection: two-sided frontier is illegal") {
    assert(!Dag.createsCycle(parent, child, Set("model.p.a")))
    assert(!Dag.createsCycle(parent, child, Set("model.p.c")))
    assert(Dag.createsCycle(parent, child, Set("model.p.b"))) // feeds c, consumes a
  }

  test("ancestors/descendants BFS") {
    assert(Dag.ancestors(parent, "model.p.c") == Set("model.p.b", "model.p.a"))
    assert(Dag.descendants(child, "model.p.a") == Set("model.p.b", "model.p.c", "test.p.t"))
  }

  test("topo sort is a valid order, deterministic, cycle-checked") {
    val order = Dag.topoSort(Set("model.p.a", "model.p.b", "model.p.c"), parent)
    assert(order.indexOf("model.p.a") < order.indexOf("model.p.b"))
    assert(order.indexOf("model.p.b") < order.indexOf("model.p.c"))
    val cyc = Map("x" -> Set("y"), "y" -> Set("x"))
    intercept[IllegalStateException](Dag.topoSort(Set("x", "y"), cyc))
  }

  def manifest: Manifest = Manifest("p",
    nodes = Map(
      "model.p.a" -> ModelNode("model.p.a", "a", "p", "models/a.sql", ""),
      "model.p.b" -> ModelNode("model.p.b", "b", "p", "models/b.sql", "",
        dependsOn = DependsOn(nodes = Vector("model.p.a"))),
      "model.p.c" -> ModelNode("model.p.c", "c", "p", "models/c.sql", "",
        dependsOn = DependsOn(nodes = Vector("model.p.b")))))

  test("selector grammar: name, +name, name+, union, exclude") {
    val m = manifest
    assert(Selector.select(m, Seq("b")) == Set("model.p.b"))
    assert(Selector.select(m, Seq("+b")) == Set("model.p.a", "model.p.b"))
    assert(Selector.select(m, Seq("b+")) == Set("model.p.b", "model.p.c"))
    assert(Selector.select(m, Seq("+b+")) == Set("model.p.a", "model.p.b", "model.p.c"))
    assert(Selector.select(m, Seq("a", "c")) == Set("model.p.a", "model.p.c"))
    assert(Selector.select(m, Seq("+c"), exclude = Seq("a")) ==
      Set("model.p.b", "model.p.c"))
    // tag:/path: are supported now (SelectorSpec); other methods still fail
    intercept[IllegalArgumentException](Selector.select(m, Seq("state:modified")))
  }

  test("A2: subproject selection excludes what the subproject already has") {
    val m = manifest
    val already = Set("model.p.b")
    assert(Selector.selectForSubproject(m, already, Seq("+c")) ==
      Selector.select(m, Seq("+c")) - "model.p.b")
  }

  test("A11: referenced docs resolve doc() calls in code and patches") {
    val doc = Documentation("doc.p.orders_doc", "orders_doc", "p",
      "models/docs.md", "{% docs orders_doc %}x{% enddocs %}")
    val a = ModelNode("model.p.a", "a", "p", "models/a.sql",
      "select 1 -- {{ doc('orders_doc') }}",
      patchPath = Some("models/_a.yml"))
    val b = ModelNode("model.p.b", "b", "p", "models/b.sql", "select 2",
      patchPath = Some("models/_b.yml"))
    val m = Manifest("p",
      nodes = Map(a.uniqueId -> a, b.uniqueId -> b),
      docs = Map(doc.uniqueId -> doc))
    // a references via raw code; b references via its patch YAML
    val patches = Map("models/_b.yml" -> "description: '{{ doc(\"orders_doc\") }}'")
    assert(Dag.referencedDocs(m, Set(a.uniqueId)) == Set(doc.uniqueId))
    assert(Dag.referencedDocs(m, Set(b.uniqueId), patches.get) == Set(doc.uniqueId))
    assert(Dag.referencedDocs(m, Set.empty) == Set.empty)
  }

  test("macro closure is a fixpoint over macro-macro deps") {
    val m = Manifest("p",
      nodes = Map("model.p.a" -> ModelNode("model.p.a", "a", "p", "models/a.sql", "",
        dependsOn = DependsOn(macros = Vector("macro.p.m1")))),
      macros = Map(
        "macro.p.m1" -> MacroNode("macro.p.m1", "m1", "p", "macros/m1.sql", "",
          dependsOnMacros = Vector("macro.p.m2")),
        "macro.p.m2" -> MacroNode("macro.p.m2", "m2", "p", "macros/m2.sql", "",
          dependsOnMacros = Vector("macro.p.m3")),
        "macro.p.m3" -> MacroNode("macro.p.m3", "m3", "p", "macros/m3.sql", "")))
    assert(Dag.macroClosure(m, Set("model.p.a")) ==
      Set("macro.p.m1", "macro.p.m2", "macro.p.m3"))
  }
}
