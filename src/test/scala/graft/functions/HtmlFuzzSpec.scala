package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized tag-soup robustness for the q96 extractor, complementing
  * HtmlSpec's hand-built cases: over arbitrary compositions of
  * well-formed tags, script/style blocks (with '<' in their bodies),
  * comments, entities and text, the extractor must never throw, never
  * leak markup into main_text, and keep its counters consistent.
  * (Stray unmatched '<' outside any tag is out of scope by design — a
  * bare angle char in TEXT survives extraction, as in jusText — so the
  * generator emits only well-formed markup; HtmlSpec pins the
  * unterminated-anchor behavior explicitly.)
  */
class HtmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("extractor is total, markup-free, and count-consistent on tag soup") {
    val rnd = new scala.util.Random(42)
    val frags = Seq(
      "<p>", "</p>", "<div class=\"x\">", "</div>", "<br>", "<li>", "</li>",
      "<script>if (a<b) { x = \"<i>hello</i>\"; }</script>",
      "<style>p { margin: 0; } .x>y { color: red; }</style>",
      "<a href=\"/x\">link text here</a>", "<a href=\"/y\">more linkage</a>",
      "<h1>", "</h1>", "<nav>", "</nav>", "<footer>", "</footer>",
      "<!-- a comment, even with <p> inside -->",
      "<!-- disabled <script> tracker, no closer -->", "&amp;", "&lt;",
      "lorem", "ipsum dolor", "x",
      "some longer chunk of plain text content that clears the length gate")
    val soups = (1 to 150).map { _ =>
      (1 to 1 + rnd.nextInt(40)).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString(" ")
    }
    val rows = soups.toDF("html")
      .select(Html.extract(Html.blocks(col("html"))).as("x"))
      .select(col("x.n_blocks"), col("x.n_kept"), col("x.n_link_dropped"),
        col("x.main_text"), length(col("x.main_text")).as("len"))
      .collect()
    assert(rows.length === soups.length)
    rows.foreach { r =>
      val (nb, nk, nl) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val mt = r.getString(3)
      assert(nk >= 0 && nl >= 0 && nb >= 0, s"negative counter: $r")
      assert(nk + nl <= nb,
        s"kept($nk) + link-dropped($nl) exceed nonempty blocks($nb)")
      assert(!mt.contains("<") && !mt.contains(">"),
        s"markup leaked into main_text: '$mt'")
      assert(!mt.contains("margin") && !mt.contains("a<b"),
        s"script/style body leaked: '$mt'")
      assert(!mt.matches(".*\\s\\s.*"), s"whitespace not collapsed: '$mt'")
    }
    // removed subtrees must not FUSE their neighbors, and a comment
    // carrying an unmatched <script> opener must not swallow the
    // following real content (single-pass alternation, leftmost match)
    val fused = Seq(
      "<p>price<!-- updated nightly -->list of items in this long block</p>",
      "<p>First good paragraph of sufficient length here</p>" +
        "<!-- disabled <script> tracker -->" +
        "<p>Second good paragraph of sufficient length too</p><style>p{}</style>")
      .toDF("html")
      .select(Html.extract(Html.blocks(col("html")))("main_text")).collect()
    assert(fused(0).getString(0) === "price list of items in this long block")
    assert(fused(1).getString(0).contains("Second good paragraph"),
      s"comment with unmatched <script> swallowed content: '${fused(1).getString(0)}'")

    // determinism: a second evaluation of the same plan is bit-identical
    val again = soups.toDF("html")
      .select(Html.extract(Html.blocks(col("html"))).as("x"))
      .select(col("x.main_text")).collect().map(_.getString(0))
    assert(again.toSeq === rows.map(_.getString(3)).toSeq)
  }

  test("adversarial unicode: total, markup-free, and codegen == interpreted") {
    val rnd = new scala.util.Random(4242)
    // BOM, NUL, lone surrogates (invalid UTF-16 the UTF8String layer must
    // normalize once at ingestion), RTL/zero-width marks, combining
    // diacritics, astral plane — injected into text AND attribute space.
    val salts = Seq("\uFEFF", "\u0000", "\uD800", "\uDC00",
      "\uD83D\uDE00", "\u200F", "\u200D", "e\u0301", "\u202E", "\uFFFD")
    val frags = Seq(
      "<p>", "</p>", "<div class=\"a b\">", "</div>",
      "<script>x = \"\uD800 \u0000\";</script>",
      "<!-- \uFEFF comment \uD83D\uDE00 -->",
      "<a href=\"/\u200F\">anchor \uFEFF text body</a>",
      "plain \uFEFF content that is long enough to clear the length gate",
      "mixed e\u0301\u200D\uD83D\uDE00 text run of sufficient length here")
    val soups = (1 to 120).map { _ =>
      (1 to 1 + rnd.nextInt(25)).map { _ =>
        val f = frags(rnd.nextInt(frags.length))
        if (rnd.nextBoolean()) salts(rnd.nextInt(salts.length)) + f else f
      }.mkString(" ")
    }
    def run(): Seq[(String, Long, Long, Long)] = soups.toDF("html")
      .select(Html.extract(Html.blocks(col("html"))).as("x"))
      .select(col("x.main_text"), col("x.n_blocks"), col("x.n_kept"),
        col("x.n_link_dropped"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val viaCodegen = run()
    viaCodegen.foreach { case (mt, nb, nk, nl) =>
      assert(!mt.contains("<") && !mt.contains(">"), s"markup leaked: '$mt'")
      assert(nk + nl <= nb && nk >= 0 && nl >= 0 && nb >= 0)
    }
    // same plan through the interpreted expression path: any divergence
    // between a regex/array expression's doGenCode and its eval on
    // surrogate-bearing inputs fails here mechanically
    val (ws, fm) = (spark.conf.get("spark.sql.codegen.wholeStage"),
      spark.conf.get("spark.sql.codegen.factoryMode"))
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === viaCodegen, "codegen vs interpreted drift")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }
}
