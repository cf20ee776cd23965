package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE vocabulary training and encoding — the full Sennrich et
  * al. 2016 Alg. 1 loop (q101/q102 were its first two iterations as
  * standalone censuses; reference counterpart: the tokenizer-prep stage a
  * training-data pipeline runs after cleaning, cf. reference
  * 5_documentation/project_README.md's NLP batch stage).
  *
  * Representation: a learned merge i is materialized by rewriting the
  * merged pair to ONE private-use-area char (U+E000+i). That keeps every
  * vocabulary word a flat string whose adjacent-pair census stays a
  * 2-char window ([[TextOps.bpePairCounts]]), and `replace`'s
  * leftmost-non-overlapping semantics match BPE's greedy merge in both
  * engines. [[trainBpe]] REQUIREs the corpus alphabet stays out of the
  * PUA block, so placeholder chars can never collide with corpus text.
  *
  * Scale shape — why BPE training is feasible on a 100 TB corpus: the
  * only corpus-proportional pass is the ONE word-frequency hash
  * aggregation (map-side combine absorbs the zipf head); every training
  * iteration after that runs on the DISTINCT-WORD table — vocabulary-
  * sized (millions of rows at any corpus size, not trillions) — as one
  * hash aggregation + one row-local rewrite, checkpointed per step so
  * lineage stays O(1). Driver state per iteration is exactly one row
  * (the argmax pair) — the [[VectorOps.trainCodebook]] bounded-collect
  * discipline. Encoding (q105) is a pure row-local expression chain (V
  * nested `replace`s inside a `transform` lambda): no join, no shuffle,
  * no vocabulary broadcast — the merge table is compiled INTO the plan.
  */
object BpeOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** One learned merge: `pair` is the 2-symbol window as trained (may
    * contain earlier placeholder chars), `sym` its single-char
    * replacement, `merged` the fully-expanded surface string. */
  final case class BpeMerge(step: Int, pair: String, sym: Char, merged: String, count: Long)

  private val SymBase = 0xE000
  /** Oracled merge count: small enough that the unrolled DuckDB oracle
    * stays readable, large enough to exercise placeholder-in-pair merges
    * (merges whose pair contains an earlier merge's symbol). */
  private[queries] val OracleMerges = 6

  /** Driver-looped BPE trainer over a (word, freq) table: repeat
    * [argmax frequency-weighted pair → rewrite vocabulary] until `merges`
    * merges are learned or no pair remains. Deterministic by
    * construction: pair counts are exact integers from a hash
    * aggregation, the argmax order (count DESC, pair ASC) is total, and
    * the rewrite is row-local — so the merge list is identical under any
    * partitioning, AQE re-plan, or rerun (BpeTrainSpec pins this). */
  def trainBpe(wordFreq: DataFrame, merges: Int): Seq[BpeMerge] = {
    // The placeholder trick is only sound if the corpus alphabet cannot
    // produce a PUA char; enforced, not assumed (one vocabulary-sized
    // filter + limit(1), bounded work).
    val puaPattern = "[" + 0xE000.toChar + "-" + 0xF8FF.toChar + "]"
    require(wordFreq.filter(col("word").rlike(puaPattern)).limit(1).count() == 0L,
      "trainBpe: corpus words must not use U+E000..U+F8FF (reserved for merge placeholders)")
    var vocab = wordFreq.localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    val expansion = scala.collection.mutable.Map.empty[Char, String]
    var i = 0
    var exhausted = false
    while (i < merges && !exhausted) {
      // collect-bound: limit(1) argmax — one row per training round
      val top = TextOps.bpePairCounts(vocab)
        .orderBy(col("pair_count").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val sym = (SymBase + i).toChar
        val merged = pair.map(c => expansion.getOrElse(c, c.toString)).mkString
        expansion(sym) = merged
        out += BpeMerge(i, pair, sym, merged, top(0).getLong(1))
        // lit(pair), not an interpolated SQL string: corpus tokens can
        // contain quote/backslash chars that would break expr() parsing.
        vocab = vocab
          .select(replace(col("word"), lit(pair), lit(sym.toString)).as("word"),
            col("freq"))
          .localCheckpoint(true)
        i += 1
      }
    }
    out.toSeq
  }

  /** Batched BPE trainer — the standard practical optimization for real
    * vocabulary sizes (V = 32k–256k): per round, ONE pair census, then
    * up to `k` merges accepted greedily in exact-argmax order
    * (count DESC, pair ASC), SKIPPING any pair that shares a symbol with
    * a pair already accepted this round. Driver jobs per vocab point
    * drop from ~2/merge to ~2/k·merge — the difference between 2·V and
    * 2·V/k Spark jobs at real V (PLANS.md carries the measured A/B).
    *
    * Exactness contract:
    *  - k = 1 reduces EXACTLY to [[trainBpe]] (the top pair is always
    *    accepted; one rewrite, re-census) — spec-pinned;
    *  - within a round, every accepted pair's recorded count is EXACT:
    *    accepted pairs have pairwise-disjoint symbols and rewrite
    *    targets are fresh PUA chars, so applying one accepted merge can
    *    neither create nor destroy occurrences of another;
    *  - across the round boundary the SELECTION can deviate from k = 1
    *    BPE: a pair CREATED by an accepted merge (or a skipped
    *    interacting pair, re-censused) may outrank the round's later
    *    picks — the documented approximation every batched trainer
    *    makes (spec demonstrates the deviation on a fixture rather
    *    than hiding it).
    *
    * The candidate window is 4·k pairs — bounded driver state; a round
    * accepts ≥ 1 merge whenever any pair remains, so progress is
    * guaranteed and early-stop matches [[trainBpe]]. */
  def trainBpeBatched(wordFreq: DataFrame, merges: Int, k: Int): Seq[BpeMerge] = {
    require(k >= 1, "trainBpeBatched: k must be >= 1")
    val puaPattern = "[" + 0xE000.toChar + "-" + 0xF8FF.toChar + "]"
    require(wordFreq.filter(col("word").rlike(puaPattern)).limit(1).count() == 0L,
      "trainBpeBatched: corpus words must not use U+E000..U+F8FF (reserved for merge placeholders)")
    var vocab = wordFreq.localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    val expansion = scala.collection.mutable.Map.empty[Char, String]
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val want = math.min(k, merges - out.size)
      // collect-bound: limit(4k) candidate window, ≤ 4·merges rows
      val top = TextOps.bpePairCounts(vocab)
        .orderBy(col("pair_count").desc, col("pair")).limit(4 * want).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[Char]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val it = top.iterator
        while (accepted.size < want && it.hasNext) {
          val r = it.next(); val p = r.getString(0)
          if (!p.exists(used.contains)) { accepted += ((p, r.getLong(1))); used ++= p }
        }
        val start = out.size
        val ms = accepted.toSeq.zipWithIndex.map { case ((pair, cnt), j) =>
          val sym = (SymBase + start + j).toChar
          val merged = pair.map(c => expansion.getOrElse(c, c.toString)).mkString
          expansion(sym) = merged
          BpeMerge(start + j, pair, sym, merged, cnt)
        }
        out ++= ms
        // All of the round's merges land in ONE projection (rank order —
        // commutative here by disjointness, but order keeps the rewrite
        // bit-identical to applying them one at a time).
        vocab = vocab
          .select(ms.foldLeft(col("word"))((a, m) =>
              replace(a, lit(m.pair), lit(m.sym.toString))).as("word"),
            col("freq"))
          .localCheckpoint(true)
      }
    }
    out.toSeq
  }

  /** The encode side: fold the ordered merge list into V nested
    * `replace`s over one token. Training order is load-bearing — later
    * pairs reference earlier placeholder symbols. */
  def bpeEncodeExpr(tok: Column, ms: Seq[BpeMerge]): Column =
    ms.foldLeft(tok)((acc, m) => replace(acc, lit(m.pair), lit(m.sym.toString)))

  /** The decode side — encode's EXACT inverse on any PUA-free input (the
    * alphabet the trainer REQUIREs): undo each merge in REVERSE training
    * order (a later merge's pair may contain an earlier placeholder, so
    * expansions must peel newest-first). Each step inverts its encode
    * twin exactly: the sym char appears only where its replace put it,
    * so replace(sym → pair) restores the pre-step string verbatim.
    * Row-local like encode — the merge table is compiled into the plan.
    * BpeTrainSpec pins decode ∘ encode = id on corpus and adversarial
    * vocabularies. */
  def bpeDecodeExpr(tok: Column, ms: Seq[BpeMerge]): Column =
    ms.reverse.foldLeft(tok)((acc, m) => replace(acc, lit(m.sym.toString), lit(m.pair)))

  /** The trained merge table, ONE per (session, sf-dir) — a production
    * tokenizer is trained once per corpus and every consumer (encode,
    * fertility rollups, the q115 pipeline) reads the same frozen
    * artifact, so retraining identical merges per consuming query both
    * misrepresented that cost structure and paid the driver loop
    * repeatedly. [[graft.SessionCache]] carries the memoization
    * discipline (stopped-session pruning, benign deterministic
    * duplicate builds). */
  private val mergeCache = new graft.SessionCache[Seq[BpeMerge]]
  private[queries] def trainedMerges(s: SparkSession, d: String): Seq[BpeMerge] =
    mergeCache.getOrBuild(s, d)(trainBpe(TextOps.bpeWordFreq(s, d), OracleMerges))

  /** q104: the ordered merge table for [[OracleMerges]] merges —
    * (step, fully-expanded merged token, frequency-weighted pair count).
    * Training runs at plan-construction time (the [[VectorOps]] codebook
    * convention); the emitted DataFrame is the V-row merge list. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, d)
      .map(m => (m.step, m.merged, m.count))
      .toDF("step", "merged", "pair_count")
      .orderBy("step")
  }

  /** The DuckDB oracle replays the identical loop UNROLLED — generated,
    * not hand-written, so the step template is stated once (the q102
    * two-step oracle generalized to V): per step, a pair census CTE, a
    * LIMIT-1 argmax CTE, an expansion CTE (placeholders substituted by
    * earlier steps' expansions), and the rewritten vocabulary CTE. A
    * corpus with fewer than V learnable merges yields NULL trailing
    * rows, filtered to match the trainer's early stop. */
  private def trainCtes: Seq[String] = trainCtes("", "TRUE")

  /** Parameterized unrolled-training CTE chain: `pfx` namespaces every
    * CTE (so two chains can coexist in one oracle — q192), `where`
    * restricts the training corpus. */
  private def trainCtes(pfx: String, where: String): Seq[String] = {
    val head = Seq(
      s"""${pfx}w AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents WHERE $where)
         |  WHERE length(word) >= 2 GROUP BY word)""".stripMargin,
      s"${pfx}m0 AS (SELECT word, freq FROM ${pfx}w)")
    val steps = (0 until OracleMerges).flatMap { i =>
      val expand = (0 until i).foldLeft("pair") { (acc, j) =>
        s"replace($acc, chr(${SymBase + j}), (SELECT exp FROM ${pfx}e$j))"
      }
      Seq(
        s"""${pfx}p$i AS (
           |  SELECT substr(word, j, 2) AS pair, freq
           |  FROM (SELECT word, freq, unnest(generate_series(1, length(word) - 1)) AS j
           |        FROM ${pfx}m$i WHERE length(word) >= 2))""".stripMargin,
        s"""${pfx}t$i AS (
           |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pc FROM ${pfx}p$i GROUP BY pair
           |  ORDER BY SUM(freq) DESC, pair LIMIT 1)""".stripMargin,
        s"${pfx}e$i AS (SELECT $expand AS exp FROM ${pfx}t$i)",
        s"${pfx}m${i + 1} AS (SELECT replace(word, (SELECT pair FROM ${pfx}t$i), " +
          s"chr(${SymBase + i})) AS word, freq FROM ${pfx}m$i)")
    }
    head ++ steps
  }

  /** The per-chain merged-list SELECT (q104's final shape, namespaced). */
  private def mergeListSql(pfx: String): String = {
    val union = (0 until OracleMerges).map { i =>
      s"SELECT $i AS step, (SELECT exp FROM ${pfx}e$i) AS merged, " +
        s"(SELECT pc FROM ${pfx}t$i) AS pair_count"
    }.mkString(" UNION ALL ")
    s"SELECT * FROM ($union) WHERE pair_count IS NOT NULL"
  }
  private def q104Sql: String =
    s"WITH ${trainCtes.mkString(",\n")}\n${mergeListSql("")} ORDER BY step"

  /** q105: encode the corpus with the trained merge table — per doc, the
    * original whitespace-token count, char mass, post-BPE symbol count,
    * and chars-per-symbol compression (the number a tokenizer team
    * actually tracks). Row-local end to end: the merge chain runs inside
    * a `transform` lambda over each doc's token array and the per-doc
    * sums are `aggregate` folds over that array — no explode, no
    * shuffle beyond the scan. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val ms = trainedMerges(s, d)
    val toks = split(trim(coalesce(col("text"), lit(""))), "\\s+")
    def sumOver(f: Column => Column): Column =
      aggregate(toks, lit(0L), (acc, x) => acc + f(x).cast("long"))
    t(s, d, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        sumOver(x => length(x)).as("n_chars"),
        sumOver(x => length(bpeEncodeExpr(x, ms))).as("n_symbols"))
      .withColumn("chars_per_symbol",
        col("n_chars").cast("double") / nullif(col("n_symbols"), lit(0)).cast("double"))
      .orderBy("doc_id")
  }
  /** Encode oracle: shares the training CTEs; the replace chain guards
    * each step's scalar subquery with a COALESCE onto a never-present
    * PUA char, so a corpus with fewer than V merges no-ops the missing
    * steps instead of NULLing every token. */
  private def q105Sql: String = {
    val chain = (0 until OracleMerges).foldLeft("tk") { (acc, i) =>
      s"replace($acc, COALESCE((SELECT pair FROM t$i), chr(${SymBase + 256 + i})), chr(${SymBase + i}))"
    }
    s"""WITH ${trainCtes.mkString(",\n")},
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS tk
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, length(tk) AS lc, length($chain) AS ls FROM tok)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(lc) AS BIGINT) AS n_chars,
       |  CAST(SUM(ls) AS BIGINT) AS n_symbols,
       |  CAST(SUM(lc) AS DOUBLE) / CAST(nullif(SUM(ls), 0) AS DOUBLE)
       |    AS chars_per_symbol
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q116: tokenizer fertility by language — the per-language
    * symbols-per-word and chars-per-symbol rollup a tokenizer team
    * reviews before freezing a vocabulary (fertility imbalance means the
    * tokenizer taxes some languages with longer sequences; cf. the
    * multilingual-tokenizer analyses around mBERT/XLM-R). Reuses q105's
    * per-doc encode through the registry and rolls it up on the `lang`
    * column; the oracle embeds q105's published SQL as a CTE — another
    * cross-query composition proof.
    *
    * Scale shape: the encode is row-local (merge table compiled into the
    * plan), the rollup one |langs|-row hash aggregation of exact BIGINT
    * sums; the two fertility ratios are single double divisions of
    * integer-exact sums, so the hash-compare holds bit-exactly. */
  private def q116(s: SparkSession, d: String): DataFrame = {
    val enc = graft.SparkEntry.queries("q105_bpe_encode")(s, d)
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("n_symbols"))
    t(s, d, "documents").select(col("doc_id"), col("lang"))
      .join(enc, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_symbols")).as("n_symbols"))
      .withColumn("fertility",
        col("n_symbols").cast("double") / nullif(col("n_words"), lit(0)).cast("double"))
      .withColumn("chars_per_symbol",
        col("n_chars").cast("double") / nullif(col("n_symbols"), lit(0)).cast("double"))
      .orderBy("lang")
  }
  private def q116Sql: String =
    s"""WITH eq AS (${q105Sql}),
       |j AS (
       |  SELECT d.lang, eq.n_tokens, eq.n_chars, eq.n_symbols
       |  FROM documents d JOIN eq USING (doc_id))
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_words,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_symbols) AS BIGINT) AS n_symbols,
       |  CAST(SUM(n_symbols) AS DOUBLE) / CAST(nullif(SUM(n_tokens), 0) AS DOUBLE)
       |    AS fertility,
       |  CAST(SUM(n_chars) AS DOUBLE) / CAST(nullif(SUM(n_symbols), 0) AS DOUBLE)
       |    AS chars_per_symbol
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** q122: unigram-LM Viterbi segmentation — the E-step of the OTHER
    * major subword tokenizer family (Kudo 2018, "Subword Regularization";
    * the SentencePiece unigram model): score every vocabulary word's best
    * segmentation under a unigram piece model whose seed vocabulary is
    * all substrings of length ≤ [[MaxPiece]], with add-nothing ML piece
    * probabilities c(p)/Σc. Emitted per word: the Viterbi log-probability
    * and its piece count (what the trainer's prune step consumes).
    *
    * Bit-exact in DuckDB despite being a DP: piece log-probs are
    * [[LmOps.PortableLn]] over INTEGER counts; the DP is unrolled to
    * [[MaxWord]] chained column stages (CTEs in the oracle), each taking
    * the max of ≤ MaxPiece candidate (score, −pieces) structs — struct
    * comparison is lexicographic in both engines and every candidate
    * score is the same fixed-order IEEE sum, so ties resolve identically.
    *
    * Scale shape: the only corpus-proportional pass is the word-frequency
    * aggregation (shared [[TextOps.bpeWordFreq]]); substring counting,
    * the logp join, and the DP all run on the DISTINCT-WORD table
    * (vocabulary-sized), with the per-word piece-logp map carried as a
    * ≤ MaxWord·MaxPiece-entry map column — no driver state at all, unlike
    * the BPE trainer's argmax loop. Words longer than MaxWord chars are
    * excluded (stated, not silent: production unigram trainers cap
    * candidate length the same way). */
  private[queries] val MaxWord = 12
  private[queries] val MaxPiece = 4

  /** Seed artifacts shared by q122 (Viterbi E-step) and q129 (M-step),
    * memoized per (session, corpus): `pcLn` = seed pieces with counts
    * and PortableLn log-probs; `probe` = one row per vocabulary word
    * carrying the (start,len)→lnp map the DP consumes. Both sit on the
    * vocabulary-sized table; the word-frequency pass inside
    * [[TextOps.bpeWordFreq]] is the only corpus-proportional stage. */
  private val seedCache = new graft.SessionCache[(DataFrame, DataFrame)]
  private def unigramSeed(s: SparkSession, d: String): (DataFrame, DataFrame) =
    seedCache.getOrBuild(s, d) {
      import LmOps.PortableLn
      val wf = TextOps.bpeWordFreq(s, d)
        .filter(length(col("word")) <= MaxWord)
        .localCheckpoint(true) // consumers: substring counts + DP probe
      // (word, j, l) occurrence rows: j 0-based start, l piece length.
      val occ = wf.select(col("word"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(word) - 1), j ->
             |  transform(sequence(1, least($MaxPiece, length(word) - j)), l ->
             |    named_struct('j', cast(j as bigint), 'l', cast(l as bigint)))))"""
            .stripMargin)).as("x"))
        .select(col("word"), col("freq"), col("x.j").as("j"), col("x.l").as("l"),
          expr("substring(word, cast(x.j as int) + 1, cast(x.l as int))").as("piece"))
        .localCheckpoint(true) // consumers: piece counts + per-word map
      val pc = occ.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      val tot = pc.agg(sum(col("cnt")).as("tot"))
      val pcLn = (PortableLn.steps("cnt", "c", spark = true) ++
        PortableLn.steps("tot", "t", spark = true))
        .foldLeft(graft.Scalars.withScalar(pc, tot)) {
          case (df, (n, e)) => df.withColumn(n, expr(e))
        }
        .select(col("piece"), col("cnt"), (col("lnc") - col("lnt")).as("lnp"))
        .localCheckpoint(true) // consumers: probe join + q129 seed rollcall
      val probe = occ.join(pcLn, Seq("piece"))
        .groupBy(col("word"), col("freq"))
        .agg(map_from_entries(collect_list(
          struct((col("j") * 16L + col("l")).as("k"), col("lnp").as("v")))).as("m"))
        .withColumn("len", length(col("word")))
        .localCheckpoint(true) // consumers: q122 DP + q129 DP
      (pcLn, probe)
    }

  private def q122(s: SparkSession, d: String): DataFrame = {
    val probe = unigramSeed(s, d)._2
      .withColumn("dps", expr(
        "array(named_struct('s', cast(0 as double), 'np', 0))"))
    val stepped = (1 to MaxWord).foldLeft(probe) { (df, i) =>
      df.withColumn("dps", expr(
        s"""CASE WHEN $i <= len THEN array_append(dps,
           |  array_max(transform(sequence(greatest($i - $MaxPiece, 0), $i - 1), j ->
           |    named_struct(
           |      's', element_at(dps, cast(j as int) + 1).s
           |             + element_at(m, cast(j * 16 + ($i - j) as bigint)),
           |      'np', element_at(dps, cast(j as int) + 1).np - 1))))
           |ELSE dps END""".stripMargin))
    }
    stepped
      .select(col("word"), col("freq"),
        expr("element_at(dps, len + 1)").as("best"))
      .select(col("word"), col("freq"),
        col("best.s").as("viterbi_logprob"),
        (-col("best.np")).as("n_pieces"),
        (length(col("word")).cast("double") /
          (-col("best.np")).cast("double")).as("chars_per_piece"))
      .orderBy("word")
  }
  /** Shared oracle prologue for q122/q129: wf → occ → pc → PortableLn
    * stages → `pl` (piece, cnt, lnp) and `d0` (per-word probe with the
    * (start,len)→lnp map and the DP seed, with or without the path
    * field). The SQL twin of [[unigramSeed]]. */
  private def unigramSeedSql(withPath: Boolean): String = {
    import LmOps.PortableLn
    val lnStages = {
      val a = PortableLn.steps("cnt", "c", spark = false)
      val b = PortableLn.steps("tot", "t", spark = false)
      a.zip(b).zipWithIndex.map { case (((na, ea), (nb, eb)), i) =>
        val src = if (i == 0) "p0" else s"p$i"
        s"p${i + 1} AS (SELECT *, $ea AS $na, $eb AS $nb FROM $src)"
      }
    }
    val seed =
      if (withPath) "[{'s': CAST(0 AS DOUBLE), 'np': CAST(0 AS INTEGER), 'p': []::VARCHAR[]}]"
      else "[{'s': CAST(0 AS DOUBLE), 'np': CAST(0 AS INTEGER)}]"
    s"""wf AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |        FROM documents)
       |  WHERE length(word) >= 2 AND length(word) <= $MaxWord
       |  GROUP BY word),
       |occ AS (
       |  SELECT word, freq, CAST(j AS BIGINT) AS j, CAST(l AS BIGINT) AS l,
       |    substr(word, CAST(j AS INTEGER) + 1, CAST(l AS INTEGER)) AS piece
       |  FROM (SELECT word, freq, unnest(range(0, length(word))) AS j FROM wf),
       |    LATERAL (SELECT unnest(range(1, LEAST($MaxPiece, length(word) - j) + 1)) AS l)),
       |pc AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM occ GROUP BY piece),
       |p0 AS (SELECT piece, cnt, (SELECT CAST(SUM(cnt) AS BIGINT) FROM pc) AS tot FROM pc),
       |${lnStages.mkString(",\n")},
       |pl AS (SELECT piece, cnt, (lnc - lnt) AS lnp FROM p${lnStages.size}),
       |d0 AS (
       |  SELECT o.word, o.freq, length(o.word) AS len,
       |    map_from_entries(list({'k': o.j * 16 + o.l, 'v': pl.lnp})) AS m,
       |    $seed AS dps
       |  FROM occ o JOIN pl USING (piece)
       |  GROUP BY o.word, o.freq)""".stripMargin
  }

  /** Unrolled DP stage CTEs; `withPath` threads the chosen piece list
    * through the max — the comparison stays (s, np, path)-lexicographic,
    * verified identical in both engines (lists compare element-wise then
    * by length in each). */
  private def dpStagesSql(withPath: Boolean): Seq[String] =
    (1 to MaxWord).map { i =>
      val src = if (i == 1) "d0" else s"d${i - 1}"
      val path = if (withPath)
        s""",
           |           'p': list_append(struct_extract(dps[CAST(j AS INTEGER) + 1], 'p'),
           |                  substr(word, CAST(j AS INTEGER) + 1, CAST($i - j AS INTEGER)))"""
          .stripMargin
      else ""
      s"""d$i AS (
         |  SELECT word, freq, len, m,
         |    CASE WHEN $i <= len THEN list_append(dps,
         |      list_reduce(
         |        list_transform(range(GREATEST($i - $MaxPiece, 0), $i), j ->
         |          {'s': struct_extract(dps[CAST(j AS INTEGER) + 1], 's')
         |                  + map_extract(m, j * 16 + ($i - j))[1],
         |           'np': struct_extract(dps[CAST(j AS INTEGER) + 1], 'np') - 1$path}),
         |        (a, x) -> CASE WHEN x > a THEN x ELSE a END))
         |    ELSE dps END AS dps
         |  FROM $src)""".stripMargin
    }

  private def q122Sql: String =
    s"""WITH ${unigramSeedSql(withPath = false)},
       |${dpStagesSql(withPath = false).mkString(",\n")}
       |SELECT word, freq,
       |  struct_extract(dps[len + 1], 's') AS viterbi_logprob,
       |  CAST(-struct_extract(dps[len + 1], 'np') AS INTEGER) AS n_pieces,
       |  CAST(length(word) AS DOUBLE)
       |    / CAST(-struct_extract(dps[len + 1], 'np') AS DOUBLE) AS chars_per_piece
       |FROM d$MaxWord ORDER BY word""".stripMargin

  /** q129: unigram-LM hard-EM M-step (Kudo 2018 §3.2's EM iteration, the
    * step a SentencePiece trainer runs between q122's E-step and vocab
    * pruning — here the Viterbi/hard-EM variant, whose expected counts
    * are 0/1 on the best segmentation, making exact SQL both feasible
    * and the published "Viterbi EM" member of the family): re-count
    * every seed piece by its use in the best segmentations (weighted by
    * word frequency), renormalize to new log-probs, and flag the pieces
    * the step prunes (count 0 — exactly what the trainer drops).
    *
    * The DP carries the chosen piece PATH through the max; ties beyond
    * q122's (score, −pieces) key resolve on the path itself —
    * list-lexicographic comparison, probed identical in Spark and DuckDB
    * — so the recount is fully deterministic, not just the score.
    * lnp_new goes NULL for pruned pieces by NULL-propagation through
    * PortableLn (both engines propagate through every stage).
    *
    * Scale shape: identical to q122 (the corpus touches only the shared
    * word-frequency pass; everything else is vocabulary-sized) plus one
    * vocabulary-sized explode of ≤ MaxWord-piece paths and a piece-keyed
    * hash agg. The memoized [[unigramSeed]] means the seed statistics
    * build once per corpus across both queries. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    import LmOps.PortableLn
    val (pcLn, probe0) = unigramSeed(s, d)
    val probe = probe0.withColumn("dps", expr(
      "array(named_struct('s', cast(0 as double), 'np', 0," +
        " 'p', cast(array() as array<string>)))"))
    val stepped = (1 to MaxWord).foldLeft(probe) { (df, i) =>
      df.withColumn("dps", expr(
        s"""CASE WHEN $i <= len THEN array_append(dps,
           |  array_max(transform(sequence(greatest($i - $MaxPiece, 0), $i - 1), j ->
           |    named_struct(
           |      's', element_at(dps, cast(j as int) + 1).s
           |             + element_at(m, cast(j * 16 + ($i - j) as bigint)),
           |      'np', element_at(dps, cast(j as int) + 1).np - 1,
           |      'p', array_append(element_at(dps, cast(j as int) + 1).p,
           |             substring(word, cast(j as int) + 1, cast($i - j as int)))))))
           |ELSE dps END""".stripMargin))
    }
    val nc = stepped
      .select(col("freq"),
        explode(expr("element_at(dps, len + 1).p")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt_em"))
    val tot2 = nc.agg(sum(col("cnt_em")).as("tot2"))
    val joined = graft.Scalars.withScalar(
      pcLn.withColumnRenamed("cnt", "cnt_seed")
        .withColumnRenamed("lnp", "lnp_old")
        .join(nc, Seq("piece"), "left"),
      tot2)
    (PortableLn.steps("cnt_em", "a", spark = true) ++
      PortableLn.steps("tot2", "b", spark = true))
      .foldLeft(joined) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .select(col("piece"), col("cnt_seed"),
        coalesce(col("cnt_em"), lit(0L)).as("cnt_em_out"),
        col("lnp_old"), (col("lna") - col("lnb")).as("lnp_new"),
        col("cnt_em").isNull.as("pruned"))
      .withColumnRenamed("cnt_em_out", "cnt_em")
      .orderBy("piece")
  }
  private def q129Sql: String = {
    val (last, ctes) = LmOps.lnCtes("n0", "n",
      Seq("cnt_em" -> "a", "tot2" -> "b"))
    s"""WITH ${unigramSeedSql(withPath = true)},
       |${dpStagesSql(withPath = true).mkString(",\n")},
       |seg AS (
       |  SELECT freq, unnest(struct_extract(dps[len + 1], 'p')) AS piece
       |  FROM d$MaxWord),
       |nc AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt_em
       |       FROM seg GROUP BY piece),
       |t2 AS (SELECT CAST(SUM(cnt_em) AS BIGINT) AS tot2 FROM nc),
       |n0 AS (
       |  SELECT pl.piece, pl.cnt AS cnt_seed, pl.lnp AS lnp_old, nc.cnt_em,
       |    (SELECT tot2 FROM t2) AS tot2
       |  FROM pl LEFT JOIN nc USING (piece)),
       |${ctes.mkString(",\n")}
       |SELECT piece, cnt_seed, COALESCE(cnt_em, CAST(0 AS BIGINT)) AS cnt_em,
       |  lnp_old, (lna - lnb) AS lnp_new, (cnt_em IS NULL) AS pruned
       |FROM $last ORDER BY piece""".stripMargin
  }

  /** q192: cross-subset tokenizer agreement — train the SAME BPE
    * procedure on two disjoint language subsets (en vs fr documents) and
    * measure merge-table agreement: common merged tokens, Jaccard, and
    * same-merge-at-same-rank count. The "can these corpora share a
    * tokenizer" diagnostic (Rust et al. 2021 ask exactly this of
    * multilingual vocabularies); low overlap means a shared vocab spends
    * its budget twice. Training is the driver-looped [[trainBpe]] (the
    * q104 convention — V iterations of vocabulary-sized work; the corpus
    * contributes one word-frequency pass PER SUBSET); the oracle unrolls
    * BOTH chains with namespaced CTEs and restates the set arithmetic.
    * Spark-side set ops run on two V-element driver lists — bounded by
    * the merge budget, not the corpus. */
  private def q192(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def wf(lang: String) = Tables(s, d, "documents")
      .filter(col("lang") === lang)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val a = trainBpe(wf("en"), OracleMerges).map(_.merged)
    val b = trainBpe(wf("fr"), OracleMerges).map(_.merged)
    val common = a.toSet.intersect(b.toSet).size.toLong
    val union = a.toSet.union(b.toSet).size.toLong
    val sameRank = a.zip(b).count { case (x, y) => x == y }.toLong
    Seq((OracleMerges.toLong, a.size.toLong, b.size.toLong, common,
        if (union > 0) common.toDouble / union.toDouble else 0.0, sameRank))
      .toDF("v", "n_merges_a", "n_merges_b", "n_common", "jaccard", "n_same_rank")
  }
  private def q192Sql: String = {
    val chainA = trainCtes("a", "lang = 'en'")
    val chainB = trainCtes("b", "lang = 'fr'")
    s"""WITH ${(chainA ++ chainB).mkString(",\n")},
       |la AS (${mergeListSql("a")}),
       |lb AS (${mergeListSql("b")}),
       |st AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM la) AS n_merges_a,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lb) AS n_merges_b,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
       |       (SELECT merged FROM la INTERSECT SELECT merged FROM lb)) AS n_common,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
       |       (SELECT merged FROM la UNION SELECT merged FROM lb)) AS n_union,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM la JOIN lb USING (step)
       |       WHERE la.merged = lb.merged) AS n_same_rank)
       |SELECT CAST($OracleMerges AS BIGINT) AS v, n_merges_a, n_merges_b, n_common,
       |  CASE WHEN n_union > 0
       |    THEN CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) ELSE 0e0 END AS jaccard,
       |  n_same_rank
       |FROM st""".stripMargin
  }


  /** q206: sample-trained tokenizer vs full-trained — the OTHER half of
    * the real-V cost model beside [[trainBpeBatched]]: production
    * tokenizers train on a deterministic corpus SAMPLE (GPT-2/Llama
    * train on a slice, never the full crawl) and encode everything,
    * because training cost is per-round-trip while encode is row-local.
    * The doc_id % 4 = 0 slice (deterministic, oracle-reproducible)
    * trains its own merge table; BOTH tokenizers encode the FULL corpus;
    * the emitted row quantifies what the 4× training-cost cut paid:
    * chars-per-symbol for each, plus merge-set agreement (q192's
    * common / same-rank stats).
    *
    * Scale shape: sample training shrinks the word-frequency pass to the
    * slice (the corpus-proportional part of training) and keeps the
    * vocabulary-sized iteration loop; both encodes ride ONE row-local
    * projection over the corpus (two replace chains in the same plan, no
    * second scan); the rollup is a groupless aggregate of exact BIGINT
    * sums, so the single cps divisions hash-match. Merge-agreement
    * scalars are V-element driver lists (the trainBpe bounded-collect
    * discipline), literal-embedded like q192. */
  private def q206(s: SparkSession, d: String): DataFrame = {
    val full = trainedMerges(s, d)
    val sampleWf = t(s, d, "documents").filter(col("doc_id") % 4 === 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val samp = trainBpe(sampleWf, OracleMerges)
    val toks = split(trim(coalesce(col("text"), lit(""))), "\\s+")
    def sumOver(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(toks, lit(0L), (acc, x) => acc + f(x).cast("long"))
    val common = full.map(_.merged).toSet.intersect(samp.map(_.merged).toSet).size.toLong
    val sameRank = full.map(_.merged).zip(samp.map(_.merged))
      .count { case (x, y) => x == y }.toLong
    t(s, d, "documents")
      .select(
        sumOver(x => length(x)).as("nc"),
        sumOver(x => length(bpeEncodeExpr(x, full))).as("nf"),
        sumOver(x => length(bpeEncodeExpr(x, samp))).as("ns"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("nf")).as("n_symbols_full"), sum(col("ns")).as("n_symbols_sample"))
      .select(lit(OracleMerges.toLong).as("v"),
        lit(samp.size.toLong).as("n_merges_sample"),
        col("n_docs"), col("n_chars"),
        col("n_symbols_full"), col("n_symbols_sample"),
        (col("n_chars").cast("double") /
          nullif(col("n_symbols_full"), lit(0)).cast("double")).as("cps_full"),
        (col("n_chars").cast("double") /
          nullif(col("n_symbols_sample"), lit(0)).cast("double")).as("cps_sample"),
        lit(common).as("n_common_merges"), lit(sameRank).as("n_same_rank"))
  }
  private def q206Sql: String = {
    val chainF = trainCtes("", "TRUE")
    val chainS = trainCtes("s", "doc_id % 4 = 0")
    def encChain(pfx: String): String =
      (0 until OracleMerges).foldLeft("tk") { (acc, i) =>
        s"replace($acc, COALESCE((SELECT pair FROM ${pfx}t$i), chr(${SymBase + 256 + i})), chr(${SymBase + i}))"
      }
    s"""WITH ${(chainF ++ chainS).mkString(",\n")},
       |la AS (${mergeListSql("")}),
       |lb AS (${mergeListSql("s")}),
       |tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS tk
       |  FROM documents),
       |enc AS (
       |  SELECT length(tk) AS lc, length(${encChain("")}) AS lf,
       |    length(${encChain("s")}) AS ls
       |  FROM tok),
       |agg AS (
       |  SELECT CAST(SUM(lc) AS BIGINT) AS n_chars,
       |    CAST(SUM(lf) AS BIGINT) AS n_symbols_full,
       |    CAST(SUM(ls) AS BIGINT) AS n_symbols_sample
       |  FROM enc),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
       |SELECT CAST($OracleMerges AS BIGINT) AS v,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lb) AS n_merges_sample,
       |  (SELECT n_docs FROM nd) AS n_docs,
       |  agg.n_chars, agg.n_symbols_full, agg.n_symbols_sample,
       |  CAST(agg.n_chars AS DOUBLE) / CAST(nullif(agg.n_symbols_full, 0) AS DOUBLE)
       |    AS cps_full,
       |  CAST(agg.n_chars AS DOUBLE) / CAST(nullif(agg.n_symbols_sample, 0) AS DOUBLE)
       |    AS cps_sample,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
       |     (SELECT merged FROM la INTERSECT SELECT merged FROM lb)) AS n_common_merges,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM la JOIN lb USING (step)
       |     WHERE la.merged = lb.merged) AS n_same_rank
       |FROM agg""".stripMargin
  }

  /** WordPiece merge: [[BpeMerge]] plus the likelihood score that chose
    * it. */
  final case class WpMerge(step: Int, pair: String, sym: Char, merged: String,
    count: Long, score: Double)

  /** Driver-looped WORDPIECE trainer — the BERT-family member of the
    * merge-trainer triad (BPE = q104, Unigram = q122/q129). Identical
    * loop shape to [[trainBpe]]; the ONE difference is the selection
    * statistic: WordPiece maximizes the pairing LIKELIHOOD
    * score(a·b) = count(a·b) / (count(a) · count(b)) (Schuster &
    * Nakajima 2012 / the BERT tokenizer's documented criterion) instead
    * of raw pair frequency — a frequent pair of already-frequent symbols
    * loses to a rarer pair whose parts occur almost nowhere else.
    *
    * Bit-portable selection: pair and symbol counts are exact integers
    * from hash aggregations; the score is CAST(pc)/(CAST(ca)·CAST(cb)) —
    * two exact casts, one correctly-rounded multiply, one
    * correctly-rounded divide, so both engines order the identical
    * doubles; ties break on pair ASC (total order). Symbol counts are
    * frequency-weighted occurrences within the SAME (word, freq)
    * vocabulary table the pair census reads, so numerator and
    * denominator move together as merges rewrite the vocabulary.
    *
    * Scale shape: per round one pair census + one symbol census (both
    * hash aggs over the vocabulary table, map-side combined) + a
    * broadcast-sized join of pair rows to the symbol table; driver
    * state is the limit(1) argmax row. The batched-round optimization
    * (trainBpeBatched) applies unchanged if ever needed at real V. */
  def trainWordPiece(wordFreq: DataFrame, merges: Int): Seq[WpMerge] = {
    val puaPattern = "[" + 0xE000.toChar + "-" + 0xF8FF.toChar + "]"
    require(wordFreq.filter(col("word").rlike(puaPattern)).limit(1).count() == 0L,
      "trainWordPiece: corpus words must not use U+E000..U+F8FF (reserved for merge placeholders)")
    var vocab = wordFreq.localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    val expansion = scala.collection.mutable.Map.empty[Char, String]
    var i = 0
    var exhausted = false
    while (i < merges && !exhausted) {
      val syms = vocab
        .select(col("freq"), explode(expr(
          "transform(sequence(1, length(word)), i -> substr(word, i, 1))")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("sc"))
      val scored = TextOps.bpePairCounts(vocab)
        .join(syms.select(col("sym").as("a"), col("sc").as("ca")),
          expr("substring(pair, 1, 1) = a"))
        .join(syms.select(col("sym").as("b"), col("sc").as("cb")),
          expr("substring(pair, 2, 1) = b"))
        .select(col("pair"), col("pair_count"),
          (col("pair_count").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double"))).as("score"))
      // collect-bound: limit(1) argmax — one row per training round
      val top = scored.orderBy(col("score").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val sym = (SymBase + i).toChar
        val merged = pair.map(c => expansion.getOrElse(c, c.toString)).mkString
        expansion(sym) = merged
        out += WpMerge(i, pair, sym, merged, top(0).getLong(1), top(0).getDouble(2))
        vocab = vocab
          .select(replace(col("word"), lit(pair), lit(sym.toString)).as("word"),
            col("freq"))
          .localCheckpoint(true)
      }
      i += 1
    }
    out.toSeq
  }

  /** The trained WordPiece merge table, ONE per (session, sf-dir) —
    * the [[trainedMerges]] memoization discipline for the second
    * trainer (q216 emits it, q217 encodes with it). */
  private val wpMergeCache = new graft.SessionCache[Seq[WpMerge]]
  private[queries] def trainedWpMerges(s: SparkSession, d: String): Seq[WpMerge] =
    wpMergeCache.getOrBuild(s, d)(trainWordPiece(TextOps.bpeWordFreq(s, d), OracleMerges))

  /** q216 — WordPiece training (merge list + the likelihood score that
    * chose each merge), completing the tokenizer-trainer triad. The
    * oracle replays the loop unrolled exactly like q104's, with the
    * score-ranked argmax: per step a pair census, a symbol census, the
    * scored LIMIT-1 argmax, the expansion, and the rewritten
    * vocabulary. */
  private def q216(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedWpMerges(s, d)
      .map(m => (m.step, m.merged, m.count, m.score))
      .toDF("step", "merged", "pair_count", "score")
      .orderBy("step")
  }
  // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
  // reference, and this chain references wm$i three times per level
  // (pair census, symbol census, rewrite) — un-materialized it
  // re-evaluates the base ~3^V times (observed minutes at sf0.001 vs
  // sub-second materialized). q104's 2-reference chain tolerates
  // inlining; this one must pin evaluation to once per step, which is
  // also what the Spark side's per-round localCheckpoint does.
  private def wpTrainCtes: Seq[String] = {
    val steps = (0 until OracleMerges).flatMap { i =>
      val expand = (0 until i).foldLeft("pair") { (acc, j) =>
        s"replace($acc, chr(${SymBase + j}), (SELECT exp FROM we$j))"
      }
      Seq(
        s"""ws$i AS MATERIALIZED (
           |  SELECT substr(word, j, 1) AS sym, CAST(SUM(freq) AS BIGINT) AS sc
           |  FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS j
           |        FROM wm$i)
           |  GROUP BY sym)""".stripMargin,
        s"""wt$i AS MATERIALIZED (
           |  SELECT pair, pc,
           |    (CAST(pc AS DOUBLE) / (CAST(sa.sc AS DOUBLE) * CAST(sb.sc AS DOUBLE))) AS score
           |  FROM (
           |    SELECT substr(word, j, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS pc
           |    FROM (SELECT word, freq, unnest(generate_series(1, length(word) - 1)) AS j
           |          FROM wm$i WHERE length(word) >= 2)
           |    GROUP BY pair) p
           |  JOIN ws$i sa ON sa.sym = substr(p.pair, 1, 1)
           |  JOIN ws$i sb ON sb.sym = substr(p.pair, 2, 1)
           |  ORDER BY score DESC, pair LIMIT 1)""".stripMargin,
        s"we$i AS MATERIALIZED (SELECT $expand AS exp FROM wt$i)",
        s"wm${i + 1} AS MATERIALIZED (SELECT replace(word, (SELECT pair FROM wt$i), " +
          s"chr(${SymBase + i})) AS word, freq FROM wm$i)")
    }
    Seq(
      s"""ww AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents)
         |  WHERE length(word) >= 2 GROUP BY word)""".stripMargin,
      "wm0 AS MATERIALIZED (SELECT word, freq FROM ww)") ++ steps
  }

  private def q216Sql: String = {
    val union = (0 until OracleMerges).map { i =>
      s"SELECT $i AS step, (SELECT exp FROM we$i) AS merged, " +
        s"(SELECT pc FROM wt$i) AS pair_count, (SELECT score FROM wt$i) AS score"
    }.mkString(" UNION ALL ")
    s"""WITH ${wpTrainCtes.mkString(",\n")}
       |SELECT * FROM ($union) WHERE pair_count IS NOT NULL ORDER BY step""".stripMargin
  }

  /** q217 — tokenizer criterion A/B at equal merge budget: encode the
    * corpus with the BPE chain AND the WordPiece chain (both V =
    * OracleMerges, both memoized artifacts) in ONE row-local projection
    * (the q206 discipline — two replace-chain expressions over a single
    * scan, no second pass), emitting per-doc symbol counts and
    * chars-per-symbol under each criterion. The number a tokenizer team
    * reads before picking the merge rule: frequency optimizes
    * compression directly, likelihood trades a little of it for
    * exclusive-pair units — the delta column is that trade, measured.
    * Scale: one corpus scan + the two driver-trained merge tables
    * compiled into the plan; oracle embeds both unrolled training
    * chains (distinct CTE namespaces) and both COALESCE-guarded encode
    * chains. */
  private def q217(s: SparkSession, d: String): DataFrame = {
    val bpe = trainedMerges(s, d)
    val wp = trainedWpMerges(s, d)
      .map(m => BpeMerge(m.step, m.pair, m.sym, m.merged, m.count))
    val toks = split(trim(coalesce(col("text"), lit(""))), "\\s+")
    def sumOver(f: Column => Column): Column =
      aggregate(toks, lit(0L), (acc, x) => acc + f(x).cast("long"))
    t(s, d, "documents")
      .select(col("doc_id"),
        sumOver(x => length(x)).as("n_chars"),
        sumOver(x => length(bpeEncodeExpr(x, bpe))).as("bpe_symbols"),
        sumOver(x => length(bpeEncodeExpr(x, wp))).as("wp_symbols"))
      .withColumn("bpe_cps", col("n_chars").cast("double") /
        nullif(col("bpe_symbols"), lit(0)).cast("double"))
      .withColumn("wp_cps", col("n_chars").cast("double") /
        nullif(col("wp_symbols"), lit(0)).cast("double"))
      .orderBy("doc_id")
  }
  private def q217Sql: String = {
    val bpeChain = (0 until OracleMerges).foldLeft("tk") { (acc, i) =>
      s"replace($acc, COALESCE((SELECT pair FROM t$i), chr(${SymBase + 256 + i})), chr(${SymBase + i}))"
    }
    val wpChain = (0 until OracleMerges).foldLeft("tk") { (acc, i) =>
      s"replace($acc, COALESCE((SELECT pair FROM wt$i), chr(${SymBase + 512 + i})), chr(${SymBase + i}))"
    }
    s"""WITH ${trainCtes.mkString(",\n")},
       |${wpTrainCtes.mkString(",\n")},
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS tk
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, length(tk) AS lc, length($bpeChain) AS ls,
       |    length($wpChain) AS lw
       |  FROM tok)
       |SELECT doc_id, CAST(SUM(lc) AS BIGINT) AS n_chars,
       |  CAST(SUM(ls) AS BIGINT) AS bpe_symbols,
       |  CAST(SUM(lw) AS BIGINT) AS wp_symbols,
       |  CAST(SUM(lc) AS DOUBLE) / CAST(nullif(SUM(ls), 0) AS DOUBLE) AS bpe_cps,
       |  CAST(SUM(lc) AS DOUBLE) / CAST(nullif(SUM(lw), 0) AS DOUBLE) AS wp_cps
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q104_bpe_train", q104, Some(q104Sql)),
    Q("q105_bpe_encode", q105, Some(q105Sql)),
    Q("q116_tokenizer_fertility", q116, Some(q116Sql)),
    Q("q122_unigram_viterbi", q122, Some(q122Sql)),
    Q("q129_unigram_em", q129, Some(q129Sql)),
    Q("q192_tokenizer_transfer", q192, Some(q192Sql)),
    Q("q206_sample_train_encode", q206, Some(q206Sql)),
    Q("q216_wordpiece_train", q216, Some(q216Sql)),
    Q("q217_wp_bpe_encode_ab", q217, Some(q217Sql)))
}
