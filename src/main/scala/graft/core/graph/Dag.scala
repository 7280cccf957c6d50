package graft.core.graph

import graft.core.model.{AccessType, Manifest}
import scala.annotation.tailrec
import scala.collection.mutable

/** Driver-side DAG algebra over the manifest adjacency maps — the
  * reference's networkx usage re-expressed as plain BFS/set algebra
  * (SURVEY.md §2.A). A 10⁴–10⁵-node resource graph needs no distributed
  * processing; graft.ops.GraphOps carries the DataFrame-iterative variant
  * for meshes that outgrow one driver.
  */
object Dag {

  /** Full ancestor closure of `start` (not including start) via BFS. */
  def ancestors(parentMap: Map[String, Set[String]], start: String): Set[String] =
    closure(parentMap, start, Int.MaxValue)

  /** Full descendant closure of `start` (not including start). */
  def descendants(childMap: Map[String, Set[String]], start: String): Set[String] =
    closure(childMap, start, Int.MaxValue)

  /** Depth-limited closures (dbt's `N+model` / `model+N` selectors). */
  def ancestorsTo(parentMap: Map[String, Set[String]], start: String, depth: Int): Set[String] =
    closure(parentMap, start, depth)
  /** Ancestor closure that PRUNES at a boundary predicate: a node
    * matching `stopAt` is neither included nor expanded — the traversal
    * shape `--defer` needs (a deferred parent serves from its state
    * relation, so its own upstream is out of scope). */
  def ancestorsTo(parentMap: Map[String, Set[String]], start: String,
      depth: Int, stopAt: String => Boolean): Set[String] = {
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(start -> 0)
    while (queue.nonEmpty) {
      val (n, d) = queue.dequeue()
      if (d < depth)
        parentMap.getOrElse(n, Set.empty).foreach { m =>
          if (!seen.contains(m) && !stopAt(m)) {
            seen += m; queue.enqueue(m -> (d + 1))
          }
        }
    }
    seen.toSet
  }
  def descendantsTo(childMap: Map[String, Set[String]], start: String, depth: Int): Set[String] =
    closure(childMap, start, depth)

  private def closure(adj: Map[String, Set[String]], start: String,
      maxDepth: Int): Set[String] = {
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(start -> 0)
    while (queue.nonEmpty) {
      val (n, d) = queue.dequeue()
      if (d < maxDepth)
        adj.getOrElse(n, Set.empty).foreach { m =>
          if (!seen.contains(m)) { seen += m; queue.enqueue(m -> (d + 1)) }
        }
    }
    seen.toSet
  }

  /** Kahn topological order; throws on cycles. */
  def topoSort(nodes: Set[String], parentMap: Map[String, Set[String]]): Vector[String] = {
    val inDeg = mutable.Map.empty[String, Int]
    val children = mutable.Map.empty[String, Vector[String]]
    nodes.foreach { n =>
      val ps = parentMap.getOrElse(n, Set.empty).filter(nodes)
      inDeg(n) = ps.size
      ps.foreach(p => children(p) = children.getOrElse(p, Vector.empty) :+ n)
    }
    // deterministic order: sorted ready queue
    val ready = mutable.PriorityQueue.empty[String](Ordering[String].reverse)
    inDeg.collect { case (n, 0) => n }.foreach(ready.enqueue(_))
    val out = Vector.newBuilder[String]
    var count = 0
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n; count += 1
      children.getOrElse(n, Vector.empty).foreach { c =>
        inDeg(c) -= 1
        if (inDeg(c) == 0) ready.enqueue(c)
      }
    }
    if (count != nodes.size)
      throw new IllegalStateException("cycle detected in model graph")
    out.result()
  }

  // -------------------------------------------------------------- A4/A5
  /** Children of `selected` that are outside it, skipping tests
    * (`dbt_projects.py:76-90`). */
  def xprojChildren(childMap: Map[String, Set[String]], selected: Set[String]): Set[String] =
    selected.flatMap(childMap.getOrElse(_, Set.empty))
      .filterNot(selected)
      .filterNot(_.startsWith("test."))

  /** Parents of `selected` outside it, skipping tests. */
  def xprojParents(parentMap: Map[String, Set[String]], selected: Set[String]): Set[String] =
    selected.flatMap(parentMap.getOrElse(_, Set.empty))
      .filterNot(selected)
      .filterNot(_.startsWith("test."))

  /** Split is illegal iff the subproject both feeds and consumes the
    * remainder (`dbt_projects.py:68-74,97-108`). */
  def createsCycle(parentMap: Map[String, Set[String]],
      childMap: Map[String, Set[String]], selected: Set[String]): Boolean =
    xprojChildren(childMap, selected).nonEmpty &&
      xprojParents(parentMap, selected).nonEmpty

  // ---------------------------------------------------------------- A6
  /** Interface nodes of `bunch`: sources of edges leaving the subgraph,
    * plus leaf nodes (out-degree 0) (`utilities/grouper.py:29-38`). */
  def identifyInterface(childMap: Map[String, Set[String]], bunch: Set[String]): Set[String] =
    bunch.filter { n =>
      val children = childMap.getOrElse(n, Set.empty)
      children.isEmpty || children.exists(!bunch.contains(_))
    }

  // ---------------------------------------------------------------- A8
  /** Drop test nodes before boundary math (`utilities/grouper.py:57-61`). */
  def cleanSubgraph(childMap: Map[String, Set[String]]): Map[String, Set[String]] =
    childMap.collect {
      case (n, cs) if !n.startsWith("test.") =>
        n -> cs.filterNot(_.startsWith("test."))
    }.withDefaultValue(Set.empty)

  // ---------------------------------------------------------------- A7
  /** boundary -> protected, interior -> private
    * (`utilities/grouper.py:40-55`). */
  def classifyAccess(childMap: Map[String, Set[String]], nodes: Set[String]): Map[String, AccessType] = {
    val clean = cleanSubgraph(childMap)
    val cleanNodes = nodes.filterNot(_.startsWith("test."))
    val boundary = identifyInterface(clean, cleanNodes)
    cleanNodes.map { n =>
      n -> (if (boundary(n)) AccessType.Protected else AccessType.Private: AccessType)
    }.toMap
  }

  // --------------------------------------------------------------- A10
  /** Transitive macro closure of the selected resources' macro deps,
    * full fixpoint (ref is depth-2: `dbt_projects.py:463-486`). */
  def macroClosure(manifest: Manifest, selected: Set[String]): Set[String] = {
    val direct = selected.flatMap { id =>
      manifest.nodes.get(id).map(_.dependsOn.macros.toSet).getOrElse(Set.empty)
    }
    @tailrec def fix(acc: Set[String]): Set[String] = {
      val next = acc ++ acc.flatMap(m =>
        manifest.macros.get(m).map(_.dependsOnMacros.toSet).getOrElse(Set.empty))
      if (next == acc) acc else fix(next)
    }
    fix(direct).filter(m => manifest.macros.get(m).exists(_.packageName == manifest.projectName))
  }

  // --------------------------------------------------------------- A11
  private val docRefRe = """\{\{\s*doc\s*\(\s*['"]([a-zA-Z0-9_\.\-]+)['"]\s*\)\s*\}\}""".r

  /** doc('name') references in raw code + patch YAML of the selected
    * nodes, resolved to doc unique ids (`dbt_projects.py:488-519`). */
  def referencedDocs(manifest: Manifest, selected: Set[String],
      patchText: String => Option[String] = _ => None): Set[String] = {
    val byName = manifest.docs.values.map(d => d.name -> d.uniqueId).toMap
    selected.flatMap { id =>
      manifest.nodes.get(id).toSeq.flatMap { n =>
        val texts = Seq(n.rawCode) ++ n.patchPath.flatMap(patchText)
        texts.flatMap(t => docRefRe.findAllMatchIn(t).map(_.group(1)))
      }
    }.flatMap(byName.get)
  }

  // --------------------------------------------------------------- A12
  /** Groups referenced by the selected resources (`dbt_projects.py:521-537`). */
  def indirectGroups(manifest: Manifest, selected: Set[String]): Set[String] =
    selected.flatMap(id => manifest.nodes.get(id).flatMap(_.group))
      .flatMap(g => manifest.groups.values.find(_.name == g).map(_.uniqueId))
}
