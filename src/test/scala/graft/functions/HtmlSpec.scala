package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Extraction semantics the q96 oracle can't isolate one at a time:
  * each case is one adversarial document with a known right answer. */
class HtmlSpec extends SparkSpec {

  private def run(html: String, minLen: Int = 25): Row = {
    import spark.implicits._
    Seq(html).toDF("html")
      .select(Html.extract(Html.blocks(col("html")), minLen).as("x"))
      .select("x.main_text", "x.n_blocks", "x.n_kept", "x.n_link_dropped")
      .head()
  }

  test("script and style bodies never leak — even when they contain '<'") {
    val r = run(
      "<p>this paragraph body is long enough to keep around</p>" +
        "<script>if (a < b) { emit(\"<p>fake</p>\"); }</script>" +
        "<style>p < div { color: red }</style>")
    assert(r.getString(0) === "this paragraph body is long enough to keep around")
    assert(r.getLong(2) === 1L)
  }

  test("link-dense blocks die on density even when long; sparse ones live") {
    val menu = "<div><a href='/a'>first long anchor text</a> " +
      "<a href='/b'>second long anchor text</a></div>"
    val prose = "<p>prose with a single <a href='/x'>small link</a> inside " +
      "a much longer run of plain body text</p>"
    val r = run(menu + prose)
    assert(r.getLong(3) === 1L, "menu should be dropped by density, not length")
    assert(r.getString(0).startsWith("prose with a single small link"))
  }

  test("short blocks drop; whitespace collapses; inline tags strip") {
    val r = run("<p>tiny</p><p>  spaced   out\t\tbody <b>bold</b> words " +
      "padded to pass the length gate  </p>")
    assert(r.getLong(1) === 2L) // both non-empty
    assert(r.getLong(2) === 1L) // only the long one kept
    assert(r.getString(0) ===
      "spaced out body bold words padded to pass the length gate")
  }

  test("degenerate inputs: empty, tag-soup-only, unterminated tags") {
    assert(run("").getLong(1) === 0L)
    assert(run("<div><nav></nav></div>").getLong(1) === 0L)
    val r = run("<p>unterminated <a href='/x'>anchor stays visible text")
    // no closing </a>: the anchor regex doesn't match, so its text counts
    // as plain — extraction degrades to keeping the visible text
    assert(r.getLong(2) === 1L)
    assert(r.getString(0) === "unterminated anchor stays visible text")
  }

  test("block tag zoo: table cells, headings, list items all segment") {
    val r = run(
      "<table><tr><td>cell one padded out to pass the length gate</td>" +
        "<td>cell two also padded out to pass the length gate</td></tr></table>" +
        "<h2>heading two padded out to pass the length gate</h2>" +
        "<ul><li>list item padded out to pass the length gate</li></ul>")
    assert(r.getLong(2) === 4L)
  }
}
