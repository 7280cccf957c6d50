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

  // ---------------------------------------------------------- control flow

  test("for loop over a list literal generates a union with loop.last") {
    val code =
      """{% for t in ['a', 'b', 'c'] %}
        |select * from {{ ref(t) }}{% if not loop.last %} union all{% endif %}
        |{% endfor %}""".stripMargin
    val out = JinjaLite.render(code, r => s"v_${r.name}", _ => "?")
    assert(out.contains("select * from v_a union all"))
    assert(out.contains("select * from v_b union all"))
    assert(out.contains("select * from v_c\n"))
    assert(!out.contains("v_c union"))
  }

  test("set + for + loop.index compose; range() iterates") {
    val code =
      """{% set buckets = 3 %}{% for i in range(buckets) %}b{{ i }}_{{ loop.index }} {% endfor %}"""
    assert(JinjaLite.renderControlFlow(code, Map.empty) == "b0_1 b1_2 b2_3 ")
  }

  test("general if/elif/else picks the right branch from typed vars") {
    val code =
      """{% if env == 'prod' %}tbl_prod{% elif env == 'stage' %}tbl_stage{% else %}tbl_dev{% endif %}"""
    def render(env: String) =
      JinjaLite.renderControlFlow(code, Map("env" -> JinjaLite.JStr(env)))
    assert(render("prod") == "tbl_prod")
    assert(render("stage") == "tbl_stage")
    assert(render("qa") == "tbl_dev")
  }

  test("nested for/if with membership and arithmetic") {
    val code =
      """{% for c in cols %}{% if c in keep %}{{ c }},{% endif %}{% endfor %}"""
    val env = Map(
      "cols" -> JinjaLite.JList(Vector("a", "b", "c").map(JinjaLite.JStr.apply)),
      "keep" -> JinjaLite.JList(Vector("a", "c").map(JinjaLite.JStr.apply)))
    assert(JinjaLite.renderControlFlow(code, env) == "a,c,")
    assert(JinjaLite.renderControlFlow("{{ 2 + 3 * 4 }}|{{ 'a' ~ 'b' }}", Map.empty)
      == "14|ab")
  }

  test("whitespace control tags trim adjacent runs") {
    val code = "x\n  {%- for i in range(2) -%}\n  {{ i }}\n  {%- endfor -%}\n  y"
    assert(JinjaLite.renderControlFlow(code, Map.empty) == "x01y")
  }

  test("macro with a list param drives a for loop after expansion") {
    val md = MacroDef("union_tables", Vector("tables" -> None),
      "{% for t in tables %}select * from {{ ref(t) }}" +
        "{% if not loop.last %} union all {% endif %}{% endfor %}")
    val out = JinjaLite.render(
      "{{ union_tables(['x', 'y']) }}",
      r => s"v_${r.name}", _ => "?",
      macros = Map("union_tables" -> md))
    assert(out == "select * from v_x union all select * from v_y")
  }

  test("is_incremental() works inside general control flow") {
    val code = "{% if is_incremental() and var('late', 'no') == 'yes' %}late{% else %}full{% endif %}"
    assert(JinjaLite.render(code, _ => "", _ => "",
      vars = Map("late" -> "yes"), isIncremental = true) == "late")
    assert(JinjaLite.render(code, _ => "", _ => "",
      vars = Map("late" -> "yes"), isIncremental = false) == "full")
  }

  test("inline-if separators and filters (the dbt loop idioms)") {
    // the {{ "," if not loop.last }} separator shape
    val code =
      """{% for c in cols %}{{ c }}{{ ", " if not loop.last }}{% endfor %}"""
    val env = Map("cols" ->
      JinjaLite.JList(Vector("a", "b", "c").map(JinjaLite.JStr.apply)))
    assert(JinjaLite.renderControlFlow(code, env) == "a, b, c")
    // filters: join / upper / length / default, and loop.length
    assert(JinjaLite.renderControlFlow("{{ cols | join('-') }}", env) == "a-b-c")
    assert(JinjaLite.renderControlFlow("{{ 'x' | upper }}{{ cols | length }}", env) == "X3")
    assert(JinjaLite.renderControlFlow("{{ '' | default('d') }}", env) == "d")
    assert(JinjaLite.renderControlFlow(
      "{% for c in cols %}{{ loop.length }}{% endfor %}", env) == "333")
    // ternary with else
    assert(JinjaLite.renderControlFlow("{{ 1 if 2 > 3 else 4 }}", Map.empty) == "4")
  }

  test("unknown tags and unresolvable spans pass through untouched") {
    val code = "{% snapshot snap %}select {{ mystery_macro('x') }}{% endsnapshot %}"
    assert(JinjaLite.renderControlFlow(code, Map.empty) == code)
  }

  test("numeric-looking vars that don't round-trip stay strings") {
    // 23-digit id exceeds int64; "007" has a leading zero — both must
    // render verbatim, not crash or lose digits
    val out = JinjaLite.render(
      "select '{{ var('account_id') }}' as a, '{{ var('code') }}' as c",
      _ => "", _ => "",
      vars = Map("account_id" -> "12345678901234567890123", "code" -> "007"))
    assert(out.contains("'12345678901234567890123'"))
    assert(out.contains("'007'"))
  }

  test("macro param substitution never rewrites string literals in tags") {
    // 'alt' as a STRING LITERAL inside the tag must survive the `alt`
    // param's substitution pass
    val md = MacroDef("pick", Vector("col" -> None, "alt" -> None),
      "{% if col == 'alt' %}A{% else %}{{ alt }}{% endif %}")
    val out = JinjaLite.render("{{ pick('alt', 'x') }}", _ => "", _ => "",
      macros = Map("pick" -> md))
    assert(out == "A")
    val out2 = JinjaLite.render("{{ pick('other', 'x') }}", _ => "", _ => "",
      macros = Map("pick" -> md))
    assert(out2 == "x")
  }

  test("nested {% if %} inside an is_incremental guard renders correctly") {
    // the old regex pre-pass matched the FIRST endif and left the block
    // unbalanced; the evaluator handles nesting natively
    val code =
      """select * from t
        |{% if is_incremental() %}where ts > 0{% if var('late', 'no') == 'yes' %} or late{% endif %} and 1=1{% endif %}""".stripMargin
    val inc = JinjaLite.render(code, _ => "", _ => "",
      vars = Map("late" -> "yes"), isIncremental = true)
    assert(inc.contains("where ts > 0 or late and 1=1"))
    val full = JinjaLite.render(code, _ => "", _ => "",
      vars = Map("late" -> "yes"), isIncremental = false)
    assert(!full.contains("where"))
  }

  test("underscore-extended tag names are not control tags") {
    val code = "{% set_helper foo %}x{% endset_helper %}"
    assert(JinjaLite.renderControlFlow(code, Map.empty) == code)
  }

  test("control-flow edge cases: nesting, shadowing, empties, errors") {
    import JinjaLite.{renderControlFlow => rcf}
    // for-in-for with the INNER loop shadowing and restoring loop.*
    assert(rcf("{% for i in range(2) %}{% for j in range(2) %}{{ i }}{{ j }},{% endfor %}[{{ loop.index }}]{% endfor %}",
      Map.empty) == "00,01,[1]10,11,[2]")
    // set inside a for re-assigns each iteration
    assert(rcf("{% for i in range(3) %}{% set d = i * 2 %}{{ d }}{% endfor %}",
      Map.empty) == "024")
    // empty iterable renders nothing; if with false cond and no else too
    assert(rcf("{% for x in [] %}X{% endfor %}{% if 1 > 2 %}Y{% endif %}",
      Map.empty) == "")
    // nested if inside for
    assert(rcf("{% for i in range(4) %}{% if i % 2 == 0 %}{{ i }}{% endif %}{% endfor %}",
      Map.empty) == "02")
    // unterminated blocks fail loudly
    intercept[IllegalArgumentException](rcf("{% for x in [1] %}a", Map.empty))
    intercept[IllegalArgumentException](rcf("{% if true %}a", Map.empty))
    // stray end tags fail loudly
    intercept[IllegalArgumentException](rcf("a{% endfor %}", Map.empty))
  }
}
