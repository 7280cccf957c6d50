package graft.core

import graft.core.parse.JinjaLite
import graft.core.parse.JinjaLite._
import org.scalatest.funsuite.AnyFunSuite

/** Jinja-lite extraction + rendering (`utilities/references.py:58-148`,
  * `storage/jinja_blocks.py:20-72`). */
class JinjaLiteSpec extends AnyFunSuite {

  test("findRefs: bare, cross-project, versioned, quote styles") {
    val code =
      """select * from {{ ref('a') }}
        |join {{ ref("proj", "b") }} using (id)
        |join {{ ref('c', v=2) }} using (id)""".stripMargin
    assert(JinjaLite.findRefs(code) == Vector(
      RefCall(None, "a", None),
      RefCall(Some("proj"), "b", None),
      RefCall(None, "c", Some(2))))
  }

  test("findSources and findConfig kwargs") {
    val code =
      """{{ config(materialized='incremental', unique_key='id') }}
        |select * from {{ source('raw', 'orders') }}""".stripMargin
    assert(JinjaLite.findSources(code) == Vector(SourceCall("raw", "orders")))
    assert(JinjaLite.findConfig(code) ==
      Map("materialized" -> "incremental", "unique_key" -> "id"))
  }

  test("findBlocks spans docs blocks with content") {
    val text =
      """{% docs orders_doc %}
        |The orders table.
        |{% enddocs %}
        |{% docs other %}x{% enddocs %}""".stripMargin
    val blocks = JinjaLite.findBlocks(text, "docs")
    assert(blocks.map(_.name) == Vector("orders_doc", "other"))
    assert(blocks.head.content.contains("The orders table."))
  }

  test("macro definitions parse params with defaults") {
    val text =
      "{% macro cents_to_dollars(column_name, scale=2) %}" +
        "({{ column_name }} / 100)::numeric(16, {{ scale }})" +
        "{% endmacro %}"
    val defs = JinjaLite.findMacroDefs(text)
    assert(defs.size == 1)
    val md = defs.head
    assert(md.name == "cents_to_dollars")
    assert(md.params == Vector("column_name" -> None, "scale" -> Some("2")))
    assert(md.body.contains("{{ column_name }}"))
  }

  test("expandMacros substitutes positional, kwarg, and default params") {
    val md = MacroDef("c2d",
      Vector("col" -> None, "scale" -> Some("2")),
      "({{ col }} / 100)::numeric(16, {{ scale }})")
    val out = JinjaLite.expandMacros(
      "select {{ c2d('order_total') }}, {{ c2d('tax', scale=4) }}",
      Map("c2d" -> md))
    assert(out == "select (order_total / 100)::numeric(16, 2), (tax / 100)::numeric(16, 4)")
  }

  test("renderIncremental keeps or drops the guarded span") {
    val code = "select * from t {% if is_incremental() %}where ts > x{% endif %}"
    assert(JinjaLite.renderIncremental(code, isIncremental = true)
      == "select * from t where ts > x")
    assert(JinjaLite.renderIncremental(code, isIncremental = false)
      == "select * from t ")
  }

  test("render: full pipeline with vars, this, config strip") {
    val code =
      """{{ config(materialized='incremental') }}
        |select * from {{ ref('stg') }}
        |{% if is_incremental() %}
        |where ts > (select max(ts) from {{ this }}) and d <= '{{ var('cutoff') }}'
        |{% endif %}""".stripMargin
    val out = JinjaLite.render(code,
      resolveRef = r => s"view_${r.name}",
      resolveSource = _ => "?",
      vars = Map("cutoff" -> "2024-01-01"),
      thisRelation = Some("tbl_this"),
      isIncremental = true)
    assert(out.contains("from view_stg"))
    assert(out.contains("from tbl_this"))
    assert(out.contains("'2024-01-01'"))
    assert(!out.contains("config("))
  }

  test("render: undefined var without default fails loudly") {
    intercept[IllegalArgumentException](
      JinjaLite.render("{{ var('nope') }}", _ => "", _ => ""))
    // default is used when the var is absent
    assert(JinjaLite.render("{{ var('nope', 'dflt') }}", _ => "", _ => "") == "dflt")
  }
}
