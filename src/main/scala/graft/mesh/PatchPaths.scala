package graft.mesh

import graft.core.model.ModelNode

/** dbt's default properties-file path for a node that has no patch yet:
  * the resource file's own directory + `_models.yml`
  * (`resolve_patch_path`, dbt_projects.py:245-250 —
  * `original_file_path.parent / f"_{resource_type.pluralize()}.yml"`). */
object PatchPaths {
  def default(m: ModelNode): String = {
    val i = m.filePath.lastIndexOf('/')
    val dir = if (i < 0) "" else m.filePath.substring(0, i + 1)
    s"${dir}_models.yml"
  }
}
