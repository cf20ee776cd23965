package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-text extraction: the step-zero operator of a web-scale
  * pretraining pipeline (the reference's collector receives clean API
  * text — `1_data_collection/collectors/google_maps_collector.py:104` —
  * so this is brief-driven, jusText/trafilatura-shaped, not a port).
  *
  * The pipeline is three block-local phases, all built from codegen'd
  * built-in functions (no UDF, whole-stage-codegen friendly, and every
  * regex is written in the Java∩RE2 dialect so a DuckDB oracle can
  * restate it verbatim):
  *
  *  1. drop non-content subtrees: `<script>`/`<style>` elements and
  *     `<!-- -->` comments vanish wholesale (lazy match, DOTALL —
  *     script bodies legally contain `<`, and comments legally contain
  *     block TAGS: without comment removal, segmentation would split
  *     inside a comment and leak `<!-- …` fragments into main_text —
  *     found by HtmlFuzzSpec's tag soup);
  *  2. segment into blocks at block-level tag boundaries
  *     (p/div/h1-h6/li/br/td/th/tr/ul/ol/table/nav/header/footer —
  *     the jusText paragraph unit), then strip the remaining inline
  *     tags and collapse whitespace inside each block;
  *  3. classify each block by the two classic boilerplate signals:
  *     LENGTH (navigation crumbs, titles, copyright lines are short)
  *     and LINK DENSITY (anchor-text chars / block chars — menus and
  *     footers are mostly links even when long). A block survives iff
  *     plain length ≥ minBlockLen AND link chars · 2 ≤ plain chars
  *     (density ≤ ½).
  *
  * Scale shape: strictly row-local projection work — no shuffle, no
  * state; at 100 TB this pipelines inside the scan stage like any other
  * string expression.
  */
object Html {

  /** Phase-1+2: array of per-block structs
    * `{p: plain text, l: anchor-text length}` — `l` is measured BEFORE
    * inline-tag stripping (on the segmented block), `p` after. Anchor
    * bodies match `[^<]*` — by the time a block is segmented its anchors
    * hold no nested block tags, and inline markup inside an anchor
    * counts toward its link chars either way. */
  def blocks(html: Column): Column = {
    // ONE alternation pass, not script-then-comment sequentially: a
    // comment containing an unmatched '<script>' opener would otherwise
    // make the lazy script regex swallow real content up to the next
    // genuine closing tag (leftmost-match resolves both nesting
    // directions). Replacement is ' ', not '': a removed subtree must
    // not fuse the words on either side ('price<!-- -->list'); the
    // later \s+ collapse normalizes any surplus.
    val noSub = regexp_replace(html,
      "(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>|<!--.*?-->", " ")
    val segs = split(noSub,
      "(?i)</?(?:p|div|h[1-6]|li|br|td|th|tr|ul|ol|table|nav|header|footer)[^>]*>")
    transform(segs, b => struct(
      trim(regexp_replace(regexp_replace(b, "<[^>]*>", ""), "\\s+", " ")).as("p"),
      length(concat_ws("",
        regexp_extract_all(b, lit("<a[^>]*>([^<]*)</a>"), lit(1))))
        .cast("bigint").as("l")))
  }

  /** Phase-3 + assembly: `{main_text, n_blocks, n_kept, n_link_dropped}`
    * over [[blocks]] output. `n_blocks` counts non-empty blocks;
    * `n_link_dropped` counts blocks long enough to keep that died on
    * link density alone — the signal a quality dashboard watches to
    * catch a selector gone wrong. */
  def extract(bs: Column, minBlockLen: Int = 25): Column = {
    val nonEmpty = filter(bs, x => length(x("p")) > 0)
    val kept = filter(bs, x =>
      length(x("p")) >= minBlockLen && x("l") * 2 <= length(x("p")))
    val linkDropped = filter(bs, x =>
      length(x("p")) >= minBlockLen && x("l") * 2 > length(x("p")))
    val mainText = array_join(transform(kept, x => x("p")), " ")
    struct(
      mainText.as("main_text"),
      size(nonEmpty).cast("bigint").as("n_blocks"),
      size(kept).cast("bigint").as("n_kept"),
      size(linkDropped).cast("bigint").as("n_link_dropped"))
  }
}
