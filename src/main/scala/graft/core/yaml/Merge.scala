package graft.core.yaml

/** The reference's two YAML-merge workhorses, as pure functions on Y.
  *
  * NamedList (`storage/file_content_editors.py:14-49`): list-of-maps ⇄
  * a map keyed by an index field (default "name", "v" for versions),
  * applied recursively so keyed sub-lists merge by key instead of being
  * replaced wholesale.
  *
  * safeUpdate (`storage/file_content_editors.py:81-93`): recursive map
  * merge where a YNull value deletes the key and sibling nesting is never
  * clobbered.
  */
object Merge {

  /** Is this a list where every item is a map containing `field`? */
  private def isNamed(l: YList, field: String): Boolean =
    l.items.nonEmpty && l.items.forall {
      case m: YMap => m.contains(field)
      case _ => false
    }

  /** Recursively convert named lists into maps keyed by `field`.
    * Keys are stringified scalars (versions may be ints). */
  def toIndexed(y: Y, field: String = "name"): Y = y match {
    case l: YList if isNamed(l, field) =>
      YMap(l.items.map { case m: YMap =>
        m(field).asStr -> toIndexed(m, field)
      case _ => throw new IllegalStateException("unreachable")
      })
    case YMap(es) => YMap(es.map { case (k, v) => k -> toIndexed(v, field) })
    case YList(is) => YList(is.map(toIndexed(_, field)))
    case s => s
  }

  /** Inverse of toIndexed: maps whose values are maps containing `field`
    * (with the matching key) fold back into lists. */
  def fromIndexed(y: Y, field: String = "name"): Y = y match {
    case m: YMap if m.entries.nonEmpty && m.entries.forall {
      case (k, vm: YMap) => vm.get(field).exists(_.asStr == k)
      case _ => false
    } => YList(m.entries.map { case (_, v) => fromIndexed(v, field) })
    case YMap(es) => YMap(es.map { case (k, v) => k -> fromIndexed(v, field) })
    case YList(is) => YList(is.map(fromIndexed(_, field)))
    case s => s
  }

  /** Recursive merge; YNull deletes; maps recurse; everything else
    * (scalars, lists) replaces. */
  def safeUpdate(dest: YMap, src: YMap): YMap =
    src.entries.foldLeft(dest) { case (acc, (k, v)) =>
      v match {
        case m: YMap =>
          val base = acc.get(k) match {
            case Some(bm: YMap) => bm
            case _ => YMap.empty
          }
          acc.updated(k, safeUpdate(base, m))
        case YNull => acc.removed(k)
        case other => acc.updated(k, other)
      }
    }
}
