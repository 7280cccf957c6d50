package graft.mesh

import graft.core.changes._
import graft.core.yaml._

/** C7 — dependencies.yml registration (`utilities/dependencies.py:8-31`).
  * Direction flips for the split-of-upstream case
  * (`storage/dbt_project_editors.py:282-288`). */
object Dependencies {

  /** Add `upstreamProject` to `downstreamProject`'s dependencies.yml. */
  def addDependency(downstreamProject: String, upstreamProject: String,
      path: String = "dependencies.yml"): ChangeSet =
    ChangeSet(Vector(ResourceChange(
      Operation.Add, EntityType.Project, upstreamProject, path,
      YMap.of("name" -> YStr(upstreamProject)))))
}
