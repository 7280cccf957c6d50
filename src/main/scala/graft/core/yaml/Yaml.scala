package graft.core.yaml

import scala.jdk.CollectionConverters._

/** Order-preserving YAML value ADT.
  *
  * The reference round-trips dbt property files with ruamel
  * (`storage/file_manager.py:13-34`: 2/4/2 indents, width 4096) and its
  * merge semantics operate on plain dict/list trees. We model the tree
  * explicitly so merge ops (`safe_update`, NamedList) are pure functions.
  */
sealed trait Y {
  def asMap: YMap = this.asInstanceOf[YMap]
  def asList: YList = this.asInstanceOf[YList]
  def asStr: String = this match {
    case YStr(s) => s
    case YInt(i) => i.toString
    case YDbl(d) => d.toString
    case YBool(b) => b.toString
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }
}
final case class YStr(s: String) extends Y
final case class YInt(i: Long) extends Y
final case class YDbl(d: Double) extends Y
final case class YBool(b: Boolean) extends Y
case object YNull extends Y
final case class YList(items: Vector[Y]) extends Y {
  def :+(y: Y): YList = YList(items :+ y)
}
final case class YMap(entries: Vector[(String, Y)]) extends Y {
  def get(k: String): Option[Y] = entries.collectFirst { case (`k`, v) => v }
  def apply(k: String): Y = get(k).getOrElse(YNull)
  def contains(k: String): Boolean = entries.exists(_._1 == k)
  def keys: Vector[String] = entries.map(_._1)
  /** set/replace preserving position; appends if absent. */
  def updated(k: String, v: Y): YMap =
    if (contains(k)) YMap(entries.map { case (key, old) => (key, if (key == k) v else old) })
    else YMap(entries :+ (k -> v))
  def removed(k: String): YMap = YMap(entries.filterNot(_._1 == k))
  def isEmpty: Boolean = entries.isEmpty
}

object YMap {
  val empty: YMap = YMap(Vector.empty)
  def of(kvs: (String, Y)*): YMap = YMap(kvs.toVector)
}
object YList { def of(ys: Y*): YList = YList(ys.toVector) }

object Yaml {

  /** Parse YAML text (snakeyaml) into the Y ADT, preserving key order. */
  def parse(text: String): Y = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    fromJava(yaml.load[AnyRef](text))
  }

  def parseMap(text: String): YMap = parse(text) match {
    case m: YMap => m
    case YNull => YMap.empty
    case other => throw new IllegalArgumentException(s"expected map, got $other")
  }

  def fromJava(o: AnyRef): Y = o match {
    case null => YNull
    case s: String => YStr(s)
    case b: java.lang.Boolean => YBool(b)
    case i: java.lang.Integer => YInt(i.longValue)
    case l: java.lang.Long => YInt(l)
    case d: java.lang.Double => YDbl(d)
    case f: java.lang.Float => YDbl(f.doubleValue)
    case bd: java.math.BigDecimal => YDbl(bd.doubleValue)
    case bi: java.math.BigInteger => YInt(bi.longValue)
    case m: java.util.Map[_, _] =>
      YMap(m.asScala.toVector.map { case (k, v) =>
        String.valueOf(k) -> fromJava(v.asInstanceOf[AnyRef])
      })
    case l: java.util.List[_] =>
      YList(l.asScala.toVector.map(v => fromJava(v.asInstanceOf[AnyRef])))
    case d: java.util.Date => YStr(d.toString)
    case other => YStr(other.toString)
  }

  /** dbt-style emitter: 2-space map indent, list items indented 2 with
    * `- ` (ruamel mapping=2/sequence=4/offset=2 look), unbounded width. */
  def dump(y: Y): String = {
    val sb = new StringBuilder
    def scalar(v: Y): String = v match {
      case YStr(s) => quoteIfNeeded(s)
      case YInt(i) => i.toString
      case YDbl(d) => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
      case YBool(b) => b.toString
      case YNull => "null"
      case _ => throw new IllegalStateException("not a scalar")
    }
    def write(v: Y, indent: Int, inline: Boolean): Unit = v match {
      case m: YMap if m.entries.isEmpty => sb.append(" {}\n")
      case m: YMap =>
        if (inline) sb.append("\n")
        m.entries.zipWithIndex.foreach { case ((k, value), _) =>
          sb.append(" " * indent).append(k).append(":")
          value match {
            case _: YMap | _: YList => write(value, indent + 2, inline = true)
            case s => sb.append(" ").append(scalar(s)).append("\n")
          }
        }
      case YList(items) if items.isEmpty => sb.append(" []\n")
      case YList(items) =>
        if (inline) sb.append("\n")
        items.foreach { item =>
          item match {
            case m: YMap if m.entries.nonEmpty =>
              sb.append(" " * indent).append("- ")
              // first entry on the dash line, rest indented +2
              val (k0, v0) = m.entries.head
              sb.append(k0).append(":")
              v0 match {
                case _: YMap | _: YList => write(v0, indent + 4, inline = true)
                case s => sb.append(" ").append(scalar(s)).append("\n")
              }
              m.entries.tail.foreach { case (k, value) =>
                sb.append(" " * (indent + 2)).append(k).append(":")
                value match {
                  case _: YMap | _: YList => write(value, indent + 4, inline = true)
                  case s => sb.append(" ").append(scalar(s)).append("\n")
                }
              }
            case l: YList =>
              sb.append(" " * indent).append("-")
              write(l, indent + 2, inline = true)
            case s =>
              sb.append(" " * indent).append("- ").append(scalar(s)).append("\n")
          }
        }
      case s => sb.append(scalar(s)).append("\n")
    }
    write(y, 0, inline = false)
    sb.toString
  }

  private val plainRe = "^[A-Za-z0-9_][A-Za-z0-9_\\- ./()<>=]*$".r
  private def quoteIfNeeded(s: String): String =
    if (s.isEmpty) "''"
    else if (plainRe.matches(s) && !Set("true", "false", "null", "yes", "no", "on", "off")
      .contains(s.toLowerCase) && s.trim == s) s
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
