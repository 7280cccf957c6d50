package graft.core.parse

import scala.util.matching.Regex

/** Jinja-lite: the template subset dbt model files actually use, handled
  * with the same regex approach as the reference's rewrite/extraction
  * passes (`utilities/references.py:58-148`, `storage/jinja_blocks.py`).
  * No general Jinja evaluation — the fixture set bounds the surface
  * (SURVEY §7 "Jinja subset").
  */
object JinjaLite {

  final case class RefCall(project: Option[String], name: String, version: Option[Int])
  final case class SourceCall(sourceName: String, table: String)
  final case class JinjaBlock(kind: String, name: String, start: Int, end: Int, content: String)

  // quote-and-whitespace tolerant, like the reference's patterns
  val refRe: Regex =
    """\{\{\s*ref\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*(?:,\s*['"]([A-Za-z0-9_.\-]+)['"]\s*)?(?:,\s*(?:v|version)\s*=\s*(\d+)\s*)?\)\s*\}\}""".r
  val sourceRe: Regex =
    """\{\{\s*source\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*,\s*['"]([A-Za-z0-9_.\-]+)['"]\s*\)\s*\}\}""".r
  val varRe: Regex =
    """\{\{\s*var\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*(?:,\s*([^)]*?)\s*)?\)\s*\}\}""".r
  val docRe: Regex =
    """\{\{\s*doc\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*\)\s*\}\}""".r
  val configRe: Regex = """\{\{\s*config\s*\(([\s\S]*?)\)\s*\}\}""".r
  val commentRe: Regex = """\{#[\s\S]*?#\}""".r
  val currentTimestampRe: Regex = """\{\{\s*current_timestamp\s*\(\s*\)\s*\}\}""".r
  val thisRe: Regex = """\{\{\s*this\s*\}\}""".r
  private val kwargRe = """([A-Za-z_][A-Za-z0-9_]*)\s*=\s*('[^']*'|"[^"]*"|[^,)\s]+)""".r

  def findRefs(code: String): Vector[RefCall] =
    refRe.findAllMatchIn(code).map { m =>
      val (proj, name) = if (m.group(2) != null) (Some(m.group(1)), m.group(2)) else (None, m.group(1))
      RefCall(proj, name, Option(m.group(3)).map(_.toInt))
    }.toVector

  /** Bare `ref('x')` / `ref('p', 'x')` strings (no `{{ }}`) — the form
    * YAML fields use (exposure depends_on, semantic-model/metric model). */
  private val bareRefRe: Regex =
    """ref\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*(?:,\s*['"]([A-Za-z0-9_.\-]+)['"]\s*)?(?:,\s*(?:v|version)\s*=\s*(\d+)\s*)?\)""".r
  def findBareRefs(text: String): Vector[RefCall] =
    bareRefRe.findAllMatchIn(text).map { m =>
      val (proj, name) =
        if (m.group(2) != null) (Some(m.group(1)), m.group(2)) else (None, m.group(1))
      RefCall(proj, name, Option(m.group(3)).map(_.toInt))
    }.toVector

  def findSources(code: String): Vector[SourceCall] =
    sourceRe.findAllMatchIn(code).map(m => SourceCall(m.group(1), m.group(2))).toVector

  // Python models call `dbt.ref("m")` / `dbt.source("s", "t")` instead of
  // jinja expressions (`references.py:102-148` rewrites these forms)
  private val pyRefRe: Regex =
    """dbt\s*\.\s*ref\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*(?:,\s*['"]([A-Za-z0-9_.\-]+)['"]\s*)?\)""".r
  private val pySourceRe: Regex =
    """dbt\s*\.\s*source\s*\(\s*['"]([A-Za-z0-9_.\-]+)['"]\s*,\s*['"]([A-Za-z0-9_.\-]+)['"]\s*\)""".r

  def findPythonRefs(code: String): Vector[RefCall] =
    pyRefRe.findAllMatchIn(code).map { m =>
      val (proj, name) =
        if (m.group(2) != null) (Some(m.group(1)), m.group(2)) else (None, m.group(1))
      RefCall(proj, name, None)
    }.toVector

  def findPythonSources(code: String): Vector[SourceCall] =
    pySourceRe.findAllMatchIn(code).map(m => SourceCall(m.group(1), m.group(2))).toVector

  def findDocRefs(code: String): Vector[String] =
    docRe.findAllMatchIn(code).map(_.group(1)).toVector

  /** `{{ config(k=v, ...) }}` kwargs as raw strings (quotes stripped). */
  def findConfig(code: String): Map[String, String] =
    configRe.findFirstMatchIn(code).map { m =>
      kwargRe.findAllMatchIn(m.group(1)).map { k =>
        k.group(1) -> k.group(2).stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }.getOrElse(Map.empty)

  /** Python models configure via `dbt.config(k=v, ...)`. */
  private val pyConfigRe: Regex = """dbt\s*\.\s*config\s*\(([\s\S]*?)\)""".r
  def findPythonConfig(code: String): Map[String, String] =
    pyConfigRe.findFirstMatchIn(code).map { m =>
      kwargRe.findAllMatchIn(m.group(1)).map { k =>
        k.group(1) -> k.group(2).stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }.getOrElse(Map.empty)

  /** `{% docs name %}…{% enddocs %}` / macro / test block spans
    * (`storage/jinja_blocks.py:20-72`). */
  def findBlocks(text: String, kind: String): Vector[JinjaBlock] = {
    val re = (s"""\\{%\\s*$kind\\s+([A-Za-z0-9_\\-]+)[^%]*%\\}([\\s\\S]*?)\\{%\\s*end$kind\\s*%\\}""").r
    re.findAllMatchIn(text).map { m =>
      JinjaBlock(kind, m.group(1), m.start, m.end, m.matched)
    }.toVector
  }

  /** Macro definitions: name, params (with defaults), body. */
  final case class MacroDef(name: String, params: Vector[(String, Option[String])], body: String)

  def findMacroDefs(text: String): Vector[MacroDef] = findDefs(text, "macro")

  /** `{% test name(model[, column_name]) %}` blocks — dbt custom generic
    * tests share the macro shape with a different keyword. */
  def findTestDefs(text: String): Vector[MacroDef] = findDefs(text, "test")

  private def findDefs(text: String, kind: String): Vector[MacroDef] = {
    val headRe = (s"""\\{%\\s*$kind\\s+([A-Za-z0-9_]+)\\s*\\(([^)]*)\\)\\s*%\\}""").r
    findBlocks(text, kind).flatMap { b =>
      headRe.findFirstMatchIn(b.content).map { h =>
        val params = h.group(2).split(",").toVector.map(_.trim).filter(_.nonEmpty).map { p =>
          p.split("=", 2) match {
            case Array(n, d) => n.trim -> Some(d.trim.stripPrefix("'").stripSuffix("'"))
            case Array(n) => n.trim -> None
          }
        }
        val body = b.content.substring(h.end - b.start)
          .replaceAll(s"""\\{%\\s*end$kind\\s*%\\}\\s*$$""", "").trim
        MacroDef(h.group(1), params, body)
      }
    }
  }

  /** Names of macros called as `{{ name(...) }}` (excluding builtins). */
  private val builtins = Set("ref", "source", "var", "config", "doc", "this", "is_incremental")
  private val callRe = """\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  def findMacroCalls(code: String): Vector[String] =
    callRe.findAllMatchIn(code).map(_.group(1)).filterNot(builtins).toVector.distinct

  // ------------------------------------------------------------ rendering

  /** Spark-native expansions of the dbt-utils macros the fixture projects
    * lean on (public semantics from dbt-labs/dbt-utils):
    *  - `generate_surrogate_key([cols…])` → md5 over '-'-joined coalesced
    *    string casts with dbt-utils' null placeholder
    *  - `date_spine(part, start, end)` → a generated series `date_<part>`
    *    from start (inclusive) to end (exclusive)
    */
  private val surrogateKeyRe: Regex =
    """\{\{\s*dbt_utils\s*\.\s*generate_surrogate_key\s*\(\s*\[([^\]]*)\]\s*\)\s*\}\}""".r
  private val dateSpineRe: Regex =
    """\{\{\s*dbt_utils\s*\.\s*date_spine\s*\(\s*'([a-z]+)'\s*,\s*"([^"]*)"\s*,\s*"([^"]*)"\s*\)\s*\}\}""".r

  def expandDbtUtils(code: String): String = {
    var out = surrogateKeyRe.replaceAllIn(code, m => {
      val cols = m.group(1).split(",").toVector.map(_.trim)
        .map(_.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
      val parts = cols.map(c =>
        s"coalesce(cast($c as string), '_dbt_utils_surrogate_key_null_')")
      Regex.quoteReplacement(s"md5(concat_ws('-', ${parts.mkString(", ")}))")
    })
    out = dateSpineRe.replaceAllIn(out, m => {
      val part = m.group(1)
      val start = m.group(2)
      val end = m.group(3)
      // dbt-utils spines are start-inclusive, end-EXCLUSIVE
      Regex.quoteReplacement(
        s"select explode(sequence(cast($start as date), " +
          s"cast($end as date) - interval 1 $part, interval 1 $part)) " +
          s"as date_$part")
    })
    out
  }

  /** Expand user macro calls (textual substitution of params into body,
    * fixpoint with depth cap). */
  def expandMacros(code: String, macros: Map[String, MacroDef], depth: Int = 5): String = {
    if (depth <= 0) return code
    var out = code
    macros.values.foreach { md =>
      val call = (s"""\\{\\{\\s*${md.name}\\s*\\(([^)]*)\\)\\s*\\}\\}""").r
      out = call.replaceAllIn(out, m => {
        val args = m.group(1).split(",").toVector.map(_.trim).filter(_.nonEmpty)
        val (pos, kw) = args.partition(!_.contains("="))
        val kwMap = kw.map { a =>
          val Array(k, v) = a.split("=", 2); k.trim -> v.trim
        }.toMap
        var body = md.body
        md.params.zipWithIndex.foreach { case ((p, default), i) =>
          val value = kwMap.getOrElse(p,
            if (i < pos.size) pos(i) else default.getOrElse(""))
          val clean = value.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\"")
          body = body.replaceAll(s"""\\{\\{\\s*$p\\s*\\}\\}""",
            Regex.quoteReplacement(clean))
        }
        Regex.quoteReplacement(body)
      })
    }
    if (out == code) out else expandMacros(out, macros, depth - 1)
  }

  /** `{% if is_incremental() %}…{% endif %}` — keep or drop the span. */
  private val incrementalRe =
    """\{%\s*if\s+is_incremental\s*\(\s*\)\s*%\}([\s\S]*?)\{%\s*endif\s*%\}""".r
  def renderIncremental(code: String, isIncremental: Boolean): String =
    incrementalRe.replaceAllIn(code, m =>
      if (isIncremental) Regex.quoteReplacement(m.group(1)) else "")

  /** Full render to executable SQL: macros → incremental-if → ref/source →
    * var → this → config stripped → doc stripped. */
  def render(code: String,
      resolveRef: RefCall => String,
      resolveSource: SourceCall => String,
      vars: Map[String, String] = Map.empty,
      thisRelation: Option[String] = None,
      macros: Map[String, MacroDef] = Map.empty,
      isIncremental: Boolean = false): String = {
    // jinja comments vanish before anything else (the fixture's
    // orders.sql carries {# ... {{ this }} ... #} commentary)
    var out = commentRe.replaceAllIn(code, "")
    out = expandDbtUtils(out)
    out = expandMacros(out, macros)
    out = renderIncremental(out, isIncremental)
    out = refRe.replaceAllIn(out, m => {
      val (proj, name) =
        if (m.group(2) != null) (Some(m.group(1)), m.group(2)) else (None, m.group(1))
      Regex.quoteReplacement(resolveRef(RefCall(proj, name, Option(m.group(3)).map(_.toInt))))
    })
    out = sourceRe.replaceAllIn(out, m =>
      Regex.quoteReplacement(resolveSource(SourceCall(m.group(1), m.group(2)))))
    out = varRe.replaceAllIn(out, m => {
      val name = m.group(1)
      val default = Option(m.group(2)).map(_.trim.stripPrefix("'").stripSuffix("'"))
      Regex.quoteReplacement(vars.get(name).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"undefined var: $name")))
    })
    // var values may themselves carry jinja (the fixture's
    // truncate_timespan_to is "{{ current_timestamp() }}"): resolve the
    // builtin expression forms after substitution
    out = currentTimestampRe.replaceAllIn(out, "current_timestamp()")
    out = thisRe.replaceAllIn(out, _ => Regex.quoteReplacement(
      thisRelation.getOrElse(throw new IllegalArgumentException("`this` outside incremental"))))
    out = configRe.replaceAllIn(out, "")
    out
  }
}
