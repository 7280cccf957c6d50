package graft.mesh

import graft.core.changes._
import graft.core.graph.Dag
import graft.core.model._
import graft.core.yaml._

/** C2/C3 — group creation + access classification
  * (`utilities/grouper.py:63-167`). */
object Grouper {

  final case class GroupConflict(resource: String, group: String)
    extends RuntimeException(s"$resource already belongs to group $group")

  /** C2: access patch for one model (`utilities/grouper.py:114-131`). */
  def accessChange(model: ModelNode, access: AccessType, group: Option[String],
      patchPathDefault: ModelNode => String = PatchPaths.default): ResourceChange = {
    val data = group.foldLeft(YMap.of("access" -> YStr(access.name))) {
      (m, g) => m.updated("group", YStr(g))
    }
    ResourceChange(
      if (model.patchPath.isDefined) Operation.Update else Operation.Add,
      EntityType.Model, model.name,
      model.patchPath.getOrElse(patchPathDefault(model)), data)
  }

  /** C3: create a group over `selected`: conflict guard, test-free
    * boundary classification (A7∘A8), group YAML + per-model access
    * patches (`utilities/grouper.py:63-112,133-167`). */
  def addGroup(manifest: Manifest, groupName: String, owner: Owner,
      selected: Set[String], groupYamlPath: String): ChangeSet = {
    // guard: no selected node may already belong to a *different* group
    selected.flatMap(manifest.nodes.get).foreach { n =>
      n.group.filter(_ != groupName).foreach(g => throw GroupConflict(n.uniqueId, g))
    }
    val classification = Dag.classifyAccess(manifest.childMap, selected)
    val ownerMap = YMap(Vector.empty ++
      owner.name.map(n => "name" -> (YStr(n): Y)) ++
      owner.email.map(e => "email" -> (YStr(e): Y)) ++
      owner.extra)
    val groupChange = ResourceChange(Operation.Add, EntityType.Group, groupName,
      groupYamlPath, YMap.of("owner" -> ownerMap))
    val accessChanges = classification.toSeq.sortBy(_._1).flatMap { case (id, access) =>
      manifest.nodes.get(id).map(m => accessChange(m, access, Some(groupName)))
    }
    ChangeSet((groupChange +: accessChanges).toVector)
  }
}
