package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Further training-data-pipeline operators: PII redaction/pseudonymization
  * and duplicate-cluster resolution (connected components over near-dup
  * pairs) — the step after pair detection that an actual dedup pipeline
  * needs (keep one doc per cluster).
  */
object PipelineOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Redaction + pseudonymization: numeric-literal scrubbing in a payload
    * column and SHA-256 key pseudonymization (bit-identical across engines
    * — standardized hash, lowercase hex in both). */
  private def q41(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .select(
        col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "<NUM>").as("props_redacted"),
        sha2(col("user_id").cast("string"), 256).as("user_pseudonym"))
      .orderBy("event_id")
  }
  private val q41Sql =
    """SELECT event_id,
      |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
      |  sha256(CAST(user_id AS VARCHAR)) AS user_pseudonym
      |FROM events ORDER BY event_id""".stripMargin

  /** Edge-count threshold below which q42 resolves components on the
    * driver. 2M directed edges ≈ 32 MB of longs — trivial driver memory,
    * and far above any plausible near-dup yield for corpora whose
    * distributed iteration would otherwise cost minutes of job overhead. */
  private val DriverCcMaxEdges = 2L * 1000 * 1000

  /** Duplicate-cluster assignment: connected components over the q27
    * near-dup pairs, min-label per component. Two execution tiers chosen by
    * the EDGE count (not the corpus size): the corpus is never iterated —
    * only docs touched by an edge are, and near-dup edge sets are sparse by
    * construction (a few pairs per million docs).
    *
    *  - edges ≤ [[DriverCcMaxEdges]]: collect the edge list and run
    *    union-find with path compression on the driver — exact same labels,
    *    zero iterative Spark jobs. This is the realistic branch even at
    *    100 TB: the expensive distributed work is the pair GENERATION
    *    (q27's inverted-index join); the component graph it emits is tiny.
    *  - otherwise: distributed min-label propagation with pointer doubling
    *    (each round also reads the label OF the current label), so chain
    *    depth halves per round and convergence is O(log diameter); the
    *    20-round cap covers diameter 2^20 and failure to converge raises
    *    rather than returning wrong labels.
    *
    * Singletons are their own cluster. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val labels = clusterLabels(s, d)
    // Singletons rejoin: label = own doc_id where no edge touched the doc,
    // size = 1 where no component size exists. Both joins have the small
    // label-side on the right (auto-broadcast), so the corpus is never
    // shuffled — the only corpus-wide exchange left is the deterministic
    // output orderBy.
    val compSizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    t(s, d, "documents")
      .join(labels.withColumnRenamed("doc_id", "l_doc"),
        col("doc_id") === col("l_doc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .join(compSizes, Seq("cluster_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Connected-component labels (doc_id → cluster_id = component min)
    * over the q27 near-dup pairs, covering ONLY edge-touched docs —
    * singletons are the caller's coalesce. Shared by q42 (cluster
    * assignment) and AssemblyOps.q109 (representative selection).
    *
    * The verified-pair artifact is memoized (and already materialized
    * with lineage cut) inside DedupOps: when q27 ran earlier in the same
    * JVM, the shingle join is not re-executed here — BENCH_r04's slowest
    * query was q42 purely from that duplication. localCheckpoint, not
    * cache, throughout: materialized with lineage CUT, so iterative plans
    * stay constant-size and freeing an old round can never cascade into
    * CacheManager recompiles (see QueryModule). */
  private[queries] def clusterLabels(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.verifiedPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct().localCheckpoint(true)
    if (edges.count() <= DriverCcMaxEdges) driverComponents(s, edges)
    else distributedComponents(edges)
  }

  /** Driver-side exact components for small edge sets: union-find with
    * path compression + union by min, then every member labeled with its
    * component's minimum doc_id (same labels the distributed propagation
    * converges to). One collect of the (already tiny) edge list. */
  private[queries] def driverComponents(s: SparkSession,
      edges: DataFrame): DataFrame = {
    // collect-bound: caller enforces count ≤ DriverCcMaxEdges before
    // dispatching here; larger edge sets take distributedComponents
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x // path compression
      while (parent.getOrElse(cur, cur) != cur) {
        val nxt = parent(cur); parent(cur) = root; cur = nxt
      }
      root
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min keeps roots = component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    val members = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    import s.implicits._
    members.toSeq.map(m => (m, find(m))).toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation with pointer doubling, for edge sets
    * too large to collect. Chain depth halves per round → O(log diameter)
    * rounds; the cap covers diameter 2^20 and a non-converged exit raises
    * rather than returning wrong labels. */
  private[queries] def distributedComponents(edges: DataFrame): DataFrame = {
    // Propagation state covers ONLY docs touched by an edge: singletons
    // can never change labels, so the iterated table is proportional to
    // the near-dup subgraph, not the corpus.
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum("cluster_id")).head().getLong(0)
    var converged = false
    var iter = 0
    val maxIter = 20
    while (!converged && iter < maxIter) {
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b2"),
          col("doc_b") === col("doc_b2"))
        .groupBy(col("doc_a")).agg(min(col("cluster_id")).as("nb_min"))
      val viaNeighbors = labels
        .join(prop, col("doc_id") === col("doc_a"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id")))
            .as("cluster_id"))
      // Pointer doubling: cluster ids are themselves doc ids, so joining
      // labels to labels-on-cluster_id jumps each doc to its label's label.
      val next = viaNeighbors.as("l")
        .join(viaNeighbors
            .select(col("doc_id").as("p_doc"), col("cluster_id").as("p_cl")),
          col("l.cluster_id") === col("p_doc"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.cluster_id"), coalesce(col("p_cl"), col("l.cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val sumNow = next.agg(sum("cluster_id")).head().getLong(0)
      converged = sumNow == prevSum
      prevSum = sumNow
      labels = next
      iter += 1
    }
    require(converged,
      s"q42 label propagation did not converge within $maxIter pointer-doubling iterations")
    labels
  }

  /** DuckDB restatement of the near-dup → connected-components chain
    * (everything up to `labels` = per-doc cluster_id over ALL docs,
    * `sizes2` = per-cluster sizes). Shared prefix of the q42 and q109
    * oracles so the CC spec is stated once. */
  private[queries] val ccCte =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |idx AS (
      |  SELECT doc_id, source, toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM docs),
      |sh AS (
      |  SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+2], ' ') AS shingle FROM idx),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM sh a JOIN sh b
      |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |nd AS (
      |  SELECT doc_a, doc_b FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM nd
      |          UNION SELECT doc_b, doc_a FROM nd),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (
      |  SELECT d.doc_id,
      |    least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
      |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
      |  GROUP BY d.doc_id),
      |sizes2 AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id)""".stripMargin

  private val q42Sql = ccCte +
    """
      |SELECT doc_id, labels.cluster_id, cluster_size,
      |       doc_id = labels.cluster_id AS is_canonical
      |FROM labels JOIN sizes2 ON labels.cluster_id = sizes2.cluster_id
      |ORDER BY doc_id""".stripMargin

  /** Correlated max per group (window-max filter ≡ correlated subquery):
    * customers holding their nation's top account balance. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    t(s, d, "customer")
      .withColumn("nation_max", max(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") === col("nation_max"))
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .orderBy("c_nationkey", "c_custkey")
  }
  private val q43Sql =
    """SELECT c_nationkey, c_custkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin

  /** Deterministic train/val/test assignment by content-independent key
    * hash (md5 — standardized, bit-identical across engines): the split a
    * training-data pipeline needs to be reproducible across reruns AND
    * engines, unlike rand()-based sampling. First hex nibble buckets
    * 12/2/2 of 16 → 75% train, 12.5% val, 12.5% test. Emits per
    * (split, source) row counts + total text bytes (shard-size planning). */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    t(s, d, "documents")
      .withColumn("split",
        when(nib <= "b", "train").when(nib <= "d", "val").otherwise("test"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("text_bytes"))
      .orderBy("split", "source")
  }
  private val q50Sql =
    """SELECT
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |       ELSE 'test' END AS split,
      |  source, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(len(text) AS BIGINT)) AS BIGINT) AS text_bytes
      |FROM documents GROUP BY 1, 2 ORDER BY split, source""".stripMargin

  /** Stratified deterministic sampling: per source, the 10 documents with
    * the smallest md5(doc_id) — an order-free, engine-reproducible "random"
    * sample per stratum (the per-group eval-set draw a training pipeline
    * needs to be stable across reruns). Spark 4 plans the rank filter as
    * WindowGroupLimit: partial top-10 per group BEFORE the exchange. */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    t(s, d, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("source"), col("doc_id"), col("h"), col("rn"))
      .orderBy("source", "rn")
  }
  private val q53Sql =
    """SELECT source, doc_id, h, rn FROM (
      |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
      |  FROM documents) t
      |WHERE rn <= 10 ORDER BY source, rn""".stripMargin

  /** One-pass table profiling: null count + distinct count for EVERY column
    * of orders, computed generically from the schema (dynamic-schema op) in
    * a single scan/aggregation, then unpivoted to one row per column — the
    * data-quality probe shape that still works when the table is 100 TB
    * (one pass, no per-column jobs). */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val aggs = o.columns.toSeq.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    o.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(o.columns.toSeq.map(c => struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"))): _*)).as("s"))
      .select(col("s.column").as("column"), col("s.n_nulls"), col("s.n_distinct"))
      .orderBy("column")
  }
  private val q54Sql = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")
    .map(c =>
      s"""SELECT '$c' AS "column",
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM orders""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  /** Chunk width for the two-level window decompositions (q92/q93):
    * largest power of two ≤ √n, floored at 16 — the same corpus-derived,
    * integer-valued knob family as VectorOps.lshBitsFor/ivfKFor. Splitting
    * an n-row order into √n-wide chunks makes BOTH levels of a two-level
    * prefix computation √n-sized: the chunk-local window sorts ≤ ~S rows
    * per task and the per-chunk summary window sorts ~n/S rows per source
    * — no task ever sorts a corpus-proportional partition, at any scale.
    * (Unlike the ANN knobs this never has to match an oracle-side
    * derivation: the oracle states the one-level SPEC and hash equality
    * proves the decomposition exact, so √ portability is a non-issue.) */
  private[queries] def chunkWidthFor(n: Long): Long =
    math.max(16L, java.lang.Long.highestOneBit(
      math.max(1L, math.sqrt(math.max(0L, n).toDouble).toLong)))

  /** Sequence-packing plan (q92): the concat-and-chunk batching a
    * pretraining pipeline feeds the trainer — documents are concatenated
    * in a deterministic order within each shard and sliced into
    * fixed-size context windows (2048 tokens here), so every token lands
    * in exactly one (shard, bin) and fill is 100% except each shard's
    * tail. Emitted per doc: its token count, the bin its FIRST token
    * lands in, and the offset within that bin — the plan a downstream
    * tokenizer/writer executes without re-scanning text.
    *
    * Scale shape: a per-source running sum computed as a TWO-LEVEL exact
    * prefix sum, because a window partitioned by raw `source` alone puts
    * corpus/|sources| rows in ONE task's sort — source cardinality does
    * not grow with the corpus (VERDICT r8 #1). Chunks are doc_id ranges
    * (`doc_id div S`, S = [[chunkWidthFor]] ≈ √n), so chunk order extends
    * doc_id order and prefix sums compose exactly:
    *
    *  1. chunk-local running sum over a (source, chunk) window — ≤ ~S
    *     rows per partition;
    *  2. per-chunk token totals, prefix-summed over a (source) window of
    *     chunk SUMMARIES — ~n/S ≈ √n rows per source, not n;
    *  3. cum_tokens = chunk_offset + chunk-local cum. Integer-exact, so
    *     the composition is bit-identical to the one-level sum.
    *
    * The offsets join keys on (source, chunk) — the same hash
    * partitioning the chunk-local window just produced, so no extra
    * exchange on the big side. The oracle deliberately stays the
    * ONE-level spec (a single global running sum per source): hash
    * equality IS the proof that the two-level decomposition is exact.
    * Explicit ROWS frames so Spark and DuckDB agree on tied order keys;
    * `div` keeps pack_bin integer-exact at any magnitude (double-rounding
    * from true `/` first drifts past 2^53). */
  private def q92(s: SparkSession, d: String): DataFrame = {
    val binSize = 2048L
    val chunkW = chunkWidthFor(t(s, d, "documents").count())
    // Referenced twice (chunk sums + the main running sum): materialize
    // per the QueryModule convention so the corpus is tokenized once.
    val tok = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        // coalesce: a NULL doc counts as the empty string's one token in
        // both engines, not a NULL that each engine's window sum skips
        // from a different row order (found by tools/fuzz_corpus.py).
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("bigint").as("n_tokens"),
        expr(s"doc_id div $chunkW").as("chunk"))
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("source"), col("chunk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wChunks = Window.partitionBy(col("source")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tok.groupBy(col("source"), col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
      .select(col("source"), col("chunk"),
        coalesce(sum(col("chunk_tokens")).over(wChunks), lit(0L)).as("chunk_offset"))
    tok
      .withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
      .join(offsets, Seq("source", "chunk"))
      .withColumn("cum_tokens", col("chunk_offset") + col("local_cum"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div $binSize").as("pack_bin"),
        ((col("cum_tokens") - col("n_tokens")) % binSize).as("bin_offset"))
      .orderBy("doc_id")
  }
  private val q92Sql =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM tok)
      |SELECT doc_id, source, n_tokens,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS pack_bin,
      |  CAST((cum_tokens - n_tokens) % 2048 AS BIGINT) AS bin_offset
      |FROM cum ORDER BY doc_id""".stripMargin

  /** md5-ticket bucket-prefix length for q93's two-level rank: k hex
    * chars give 16^k buckets; k ≈ bit_length(n)/8 targets ~√n buckets of
    * ~√n rows each, clamped to [1, 8]. Same corpus-derived-knob family
    * as [[chunkWidthFor]], and like it never oracle-matched — the oracle
    * is the one-level spec. */
  private[queries] def ticketPrefixFor(n: Long): Int = {
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 2L) - 1)
    math.max(1, math.min(8, bitLen / 8))
  }

  /** Temperature-balanced source sampling (q93): the source/language
    * re-weighting step a multilingual pretraining mix runs — big sources
    * are downsampled toward √n so small sources aren't drowned (the
    * α = 0.5 point of the pⁱ ∝ nᵢ^α temperature family; √ is used
    * because IEEE sqrt is correctly rounded in BOTH engines, where a
    * general pow(x, 0.7) is not bit-portable). Per-source quota =
    * ceil(√n · 10); selection is the deterministic smallest-md5-ticket
    * rank from q53 — membership is a pure function of the data, stable
    * across engines, partitionings, and reruns. Tickets coalesce a NULL
    * source to '' on BOTH sides (concat_ws would silently skip the NULL
    * in Spark while the oracle's `||` propagates it — divergent sampling
    * membership the moment source is nullable).
    *
    * Scale shape: the per-source rank is computed as a TWO-LEVEL exact
    * rank, because a window partitioned by raw `source` alone sorts
    * corpus/|sources| rows in one task — source cardinality does not
    * grow with the corpus (VERDICT r8 #1). The ticket's own leading k
    * hex chars ([[ticketPrefixFor]], 16^k ≈ √n) bucket the ORDER-BY key
    * space, so bucket order extends ticket order — md5 is uniform, so
    * buckets are balanced by construction (the same reason GlobalRank's
    * range buckets work, done here per source with zero driver state):
    *
    *  1. bucket-local row_number over a (source, bucket) window — ~n/16^k
    *     ≈ √n rows per partition;
    *  2. per-bucket counts, prefix-summed over a (source) window of
    *     bucket SUMMARIES — 16^k ≈ √n rows per source, not n;
    *  3. rnk = bucket_offset + bucket-local rank; quota filter after a
    *     broadcast join of the per-source quotas (one row per source).
    *
    * Both levels are corpus-size-bounded at ~√n; the counts join keys on
    * (source, bucket) — the hash partitioning the bucket-local window
    * just produced. The oracle deliberately stays the ONE-level spec
    * (a single per-source rank window): hash equality IS the proof that
    * the bucket decomposition is exact. */
  private def q93(s: SparkSession, d: String): DataFrame = {
    val k = ticketPrefixFor(t(s, d, "documents").count())
    val quota = t(s, d, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        ceil(sqrt(col("n_docs").cast("double")) * 10).cast("bigint").as("quota"))
    // Referenced twice (bucket counts + the ranked probe): materialize
    // per the QueryModule convention so tickets are hashed once.
    val tickets = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws("|", coalesce(col("source"), lit("")), col("doc_id"))).as("tkt"))
      .withColumn("bucket", substring(col("tkt"), 1, k))
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("tkt"), col("doc_id"))
    val wBuckets = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tickets.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("bucket_docs"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("bucket_docs")).over(wBuckets), lit(0L)).as("bucket_offset"))
    tickets
      .withColumn("local_rnk", row_number().over(wLocal).cast("bigint"))
      .join(offsets, Seq("source", "bucket"))
      .withColumn("rnk", col("bucket_offset") + col("local_rnk"))
      .join(broadcast(quota), "source")
      .filter(col("rnk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("n_docs"), col("quota"), col("rnk"))
      .orderBy("doc_id")
  }
  private val q93Sql =
    """WITH q AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE)) * 10) AS BIGINT) AS quota
      |  FROM documents GROUP BY source),
      |r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(COALESCE(source, '') || '|' || CAST(doc_id AS VARCHAR)),
      |        doc_id) AS rnk
      |  FROM documents)
      |SELECT r.doc_id, r.source, q.n_docs, q.quota, r.rnk
      |FROM r JOIN q USING (source)
      |WHERE r.rnk <= q.quota ORDER BY doc_id""".stripMargin

  /** Quality funnel (q95): the five LLM-data gates composed in pipeline
    * order — C4 line filter (q97) → Gopher rules (q88) → repetition
    * (q91) → benchmark decontamination (q89) → exact dedup (q26) —
    * emitting the per-stage survival counts every data team reports
    * before a training run. Docs a gate never scored (e.g. too short for
    * q89's shingles) are conservative-defaulted: not passing quality
    * gates, not contaminated, not duplicate.
    *
    * The implementation REUSES the sibling queries through the public
    * SparkEntry registry rather than restating their logic (via the
    * shared [[gateFlags]] verdict table q115 also consumes), and the
    * DuckDB oracle embeds the siblings' published oracle SQL as CTEs —
    * so the funnel doubles as a composition test: five independently
    * hash-verified gates must still agree when joined. */
  /** The five-gate verdict table (doc_id + one conservative-defaulted
    * boolean per gate), ONE per (session, sf-dir): q95 aggregates it and
    * q115 filters on it, and a production pipeline materializes gate
    * verdicts as columns once rather than re-running every gate per
    * consumer. [[graft.SessionCache]] carries the memoization
    * discipline (stopped-session pruning, benign deterministic
    * duplicate builds). */
  private val gateCache = new graft.SessionCache[DataFrame]
  private[queries] def gateFlags(s: SparkSession, d: String): DataFrame =
    gateCache.getOrBuild(s, d) {
      val q = graft.SparkEntry.queries
      t(s, d, "documents").select(col("doc_id"))
        .join(q("q97_c4_line_filter")(s, d)
          .select(col("doc_id"), col("doc_pass")), Seq("doc_id"), "left")
        .join(q("q88_gopher_quality")(s, d)
          .select(col("doc_id"), col("passes_gopher")), Seq("doc_id"), "left")
        .join(q("q91_gopher_repetition")(s, d)
          .select(col("doc_id"), col("repetition_pass")), Seq("doc_id"), "left")
        .join(q("q89_contamination")(s, d)
          .select(col("doc_id"), col("contaminated")), Seq("doc_id"), "left")
        .join(q("q26_dedup_exact")(s, d)
          .select(col("doc_id"), col("is_dup")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("doc_pass"), lit(false)).as("l"),
          coalesce(col("passes_gopher"), lit(false)).as("g"),
          coalesce(col("repetition_pass"), lit(false)).as("r"),
          (!coalesce(col("contaminated"), lit(false))).as("c"),
          (!coalesce(col("is_dup"), lit(false))).as("u"))
        .localCheckpoint(true)
    }

  private def q95(s: SparkSession, d: String): DataFrame = {
    val flags = gateFlags(s, d)
    val s0to5 = flags.agg(
      count(lit(1)).as("s0"),
      sum(when(col("l"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("l") && col("g"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("l") && col("g") && col("r"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("l") && col("g") && col("r") && col("c"), 1L).otherwise(0L)).as("s4"),
      sum(when(col("l") && col("g") && col("r") && col("c") && col("u"), 1L)
        .otherwise(0L)).as("s5"))
    s0to5.select(explode(array(
        struct(lit(0).as("stage"), lit("total").as("stage_name"), col("s0").as("docs_surviving")),
        struct(lit(1).as("stage"), lit("line_filter").as("stage_name"), col("s1").as("docs_surviving")),
        struct(lit(2).as("stage"), lit("gopher_rules").as("stage_name"), col("s2").as("docs_surviving")),
        struct(lit(3).as("stage"), lit("repetition").as("stage_name"), col("s3").as("docs_surviving")),
        struct(lit(4).as("stage"), lit("decontamination").as("stage_name"), col("s4").as("docs_surviving")),
        struct(lit(5).as("stage"), lit("exact_dedup").as("stage_name"), col("s5").as("docs_surviving"))))
        .as("x"))
      .select(col("x.stage").as("stage"), col("x.stage_name").as("stage_name"),
        col("x.docs_surviving").as("docs_surviving"))
      .orderBy("stage")
  }
  /** The five-gate oracle prologue, stated ONCE for every composition
    * oracle (q95/q115/q118 — the SQL twin of [[gateFlags]]): the gate
    * CTEs (each embedding the sibling's published oracle SQL), the
    * conservative-defaulted flag expressions, and the doc_id joins. A
    * gate's column name, default, or polarity now changes in one place
    * on each side (Scala: gateFlags; SQL: here) or the composition
    * oracles diverge — the defect class the round-10 review flagged.
    * defs, not vals: they read the sibling modules' published maps. */
  private[queries] def gateCtesSql: String = {
    val l = LineOps.oracleSql("q97_c4_line_filter")
    val g = TextOps.oracleSql("q88_gopher_quality")
    val r = TextOps.oracleSql("q91_gopher_repetition")
    val c = DedupOps.oracleSql("q89_contamination")
    val u = DedupOps.oracleSql("q26_dedup_exact")
    s"lq AS ($l), gq AS ($g), rq AS ($r), cq AS ($c), uq AS ($u)"
  }
  private[queries] val gateFlagExprsSql: String =
    """COALESCE(lq.doc_pass, false) AS l,
      |    COALESCE(gq.passes_gopher, false) AS g,
      |    COALESCE(rq.repetition_pass, false) AS r,
      |    NOT COALESCE(cq.contaminated, false) AS c,
      |    NOT COALESCE(uq.is_dup, false) AS u""".stripMargin
  private[queries] val gateJoinsSql: String =
    """LEFT JOIN lq USING (doc_id) LEFT JOIN gq USING (doc_id)
      |  LEFT JOIN rq USING (doc_id)
      |  LEFT JOIN cq USING (doc_id) LEFT JOIN uq USING (doc_id)""".stripMargin
  private[queries] val gateConjunctionSql: String =
    """COALESCE(lq.doc_pass, false) AND COALESCE(gq.passes_gopher, false)
      |    AND COALESCE(rq.repetition_pass, false)
      |    AND NOT COALESCE(cq.contaminated, false)
      |    AND NOT COALESCE(uq.is_dup, false)""".stripMargin

  private def q95Sql: String = {
    s"""WITH $gateCtesSql,
       |f AS (
       |  SELECT d.doc_id,
       |    $gateFlagExprsSql
       |  FROM documents d
       |  $gateJoinsSql),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
       |    CAST(SUM(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN l AND g THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(SUM(CASE WHEN l AND g AND r THEN 1 ELSE 0 END) AS BIGINT) AS s3,
       |    CAST(SUM(CASE WHEN l AND g AND r AND c THEN 1 ELSE 0 END) AS BIGINT) AS s4,
       |    CAST(SUM(CASE WHEN l AND g AND r AND c AND u THEN 1 ELSE 0 END) AS BIGINT) AS s5
       |  FROM f)
       |SELECT stage, stage_name, docs_surviving FROM (
       |  SELECT 0 AS stage, 'total' AS stage_name, s0 AS docs_surviving FROM s
       |  UNION ALL SELECT 1, 'line_filter', s1 FROM s
       |  UNION ALL SELECT 2, 'gopher_rules', s2 FROM s
       |  UNION ALL SELECT 3, 'repetition', s3 FROM s
       |  UNION ALL SELECT 4, 'decontamination', s4 FROM s
       |  UNION ALL SELECT 5, 'exact_dedup', s5 FROM s)
       |ORDER BY stage""".stripMargin
  }

  /** Training-shard assignment (q100): the deterministic corpus shuffle a
    * dataloader pipeline runs before writing fixed-size training shards —
    * a random-but-reproducible global order (md5 ticket, q93's membership
    * idiom: a pure function of the data, stable across engines and
    * reruns) block-assigned to S shards of capacity ceil(n/S), so each
    * shard is one contiguous run of the shuffled order (what a shard
    * WRITER wants: shard s = rows [s·cap, (s+1)·cap)).
    *
    * Scale shape: the global position comes from [[graft.operators.GlobalRank]]
    * — the two-pass boundary-bucket construction whose only wide stage is
    * a per-bucket window — NOT `row_number()` over a single partition,
    * which is the 100 TB killer the operator exists to replace. S =
    * [[chunkWidthFor]] ≈ √n (corpus-derived like every knob here); the
    * oracle restates the one-level ROW_NUMBER spec plus the identical
    * integer-only knob derivation, so hash equality proves both the rank
    * decomposition and the shard arithmetic exact at every scale. */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"),
      md5(concat_ws("|", lit("shard"), col("doc_id"))).as("tkt"))
    // GlobalRank's boundary sketch needs a NUMERIC key; a fixed-length
    // lowercase-hex string orders identically to its numeric value, so
    // rank on the ticket's first 15 hex chars (60 bits — fits a BIGINT)
    // and tie-break on the full ticket: the global order is EXACTLY
    // (tkt, doc_id), which is what the oracle's one-level window states.
    // n rides along from withRank's pass-1 count (no separate count job);
    // S and cap are the SAME integer formula the oracle states
    // (= chunkWidthFor, parity pinned in PipelineOpsKnobsSpec), and since
    // n is a literal the whole arithmetic constant-folds.
    val sExpr = "greatest(16L, shiftleft(cast(1 as bigint)," +
      " length(bin(cast(floor(sqrt(cast(n as double))) as bigint))) - 1))"
    val capExpr = s"((n + ($sExpr) - 1) div ($sExpr))"
    graft.operators.GlobalRank
      .withRank(docs,
        expr("cast(conv(substring(tkt, 1, 15), 16, 10) as bigint)"),
        descending = false,
        tieBreakers = Seq(col("tkt"), col("doc_id")), rnName = "rn",
        totalName = Some("n"))
      .select(col("doc_id"), col("tkt"), col("rn"),
        expr(s"(rn - 1) div $capExpr").as("shard"),
        expr(s"(rn - 1) % $capExpr").as("pos"))
      .orderBy("doc_id")
  }
  private val q100Sql =
    """WITH k AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(GREATEST(16, 1 << (LENGTH(BIN(CAST(FLOOR(SQRT(CAST(COUNT(*)
      |      AS DOUBLE))) AS BIGINT))) - 1)) AS BIGINT) AS s
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, md5('shard|' || CAST(doc_id AS VARCHAR)) AS tkt,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY md5('shard|' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS BIGINT) AS rn
      |  FROM documents)
      |SELECT r.doc_id, r.tkt, r.rn,
      |  (r.rn - 1) // ((k.n + k.s - 1) // k.s) AS shard,
      |  (r.rn - 1) % ((k.n + k.s - 1) // k.s) AS pos
      |FROM r, k ORDER BY r.doc_id""".stripMargin

  /** End-to-end pretraining corpus assembly (q115): the full
    * filter→tokenize→shuffle→pack pipeline a data team runs between a raw
    * crawl and the trainer's dataloader, as ONE composed plan — the
    * per-doc execution plan for every SURVIVING document:
    *
    *  1. gate: the five q95 quality gates (C4 lines, Gopher rules,
    *     repetition, decontamination, exact dedup), conjoined;
    *  2. tokenize: the trained-BPE symbol count per doc (q105's encode);
    *  3. shuffle: the deterministic md5-ticket global order (q100's
    *     idiom — a pure function of the data, reproducible anywhere);
    *  4. pack: each doc's first-token (bin, offset) in 2048-symbol
    *     context windows over that global order (q92's concat-and-chunk,
    *     here corpus-GLOBAL rather than per-source).
    *
    * Like q95 this REUSES the sibling queries through the SparkEntry
    * registry and embeds their published oracle SQL as CTEs — a
    * composition test across seven independently hash-verified queries.
    *
    * Scale shape: the one new wide primitive is the corpus-global running
    * sum of symbol counts in ticket order, which is exactly
    * [[graft.operators.GlobalRank.withRank]]'s `prefixSum` — two-pass
    * boundary buckets, per-bucket window, broadcast literal offsets —
    * never `SUM() OVER (ORDER BY ...)` in a single partition. The
    * composed input is localCheckpoint'ed first because withRank
    * evaluates its input up to three times (its documented contract) and
    * the upstream here is five joins plus the BPE encode. The oracle
    * states the ONE-level window spec; hash equality proves the
    * decomposition. */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val q = graft.SparkEntry.queries
    val binSize = 2048L
    val surv = gateFlags(s, d)
      .filter(col("l") && col("g") && col("r") && col("c") && col("u"))
      .select(col("doc_id"))
    val pick = surv
      .join(q("q105_bpe_encode")(s, d)
        .select(col("doc_id"), col("n_symbols")), Seq("doc_id"))
      .withColumn("tkt", md5(concat_ws("|", lit("pack"), col("doc_id"))))
      .localCheckpoint(true) // withRank evaluates its input up to thrice
    graft.operators.GlobalRank.withRank(pick,
        expr("cast(conv(substring(tkt, 1, 15), 16, 10) as bigint)"),
        descending = false,
        tieBreakers = Seq(col("tkt"), col("doc_id")), rnName = "rn",
        prefixSum = Some((col("n_symbols"), "cum_symbols")))
      .select(col("doc_id"), col("tkt"), col("rn"), col("n_symbols"),
        col("cum_symbols"),
        expr(s"(cum_symbols - n_symbols) div $binSize").as("pack_bin"),
        ((col("cum_symbols") - col("n_symbols")) % binSize).as("bin_offset"))
      .orderBy("doc_id")
  }
  /** def, not val: reads the sibling modules' published oracle maps
    * (the five-gate prologue via [[gateCtesSql]]). */
  private def q115Sql: String = {
    val e = BpeOps.oracleSql("q105_bpe_encode")
    s"""WITH $gateCtesSql,
       |eq AS ($e),
       |surv AS (
       |  SELECT d.doc_id
       |  FROM documents d
       |  $gateJoinsSql
       |  WHERE $gateConjunctionSql),
       |pick AS (
       |  SELECT s.doc_id, eq.n_symbols,
       |    md5('pack|' || CAST(s.doc_id AS VARCHAR)) AS tkt
       |  FROM surv s JOIN eq USING (doc_id)),
       |cum AS (
       |  SELECT doc_id, tkt, n_symbols,
       |    CAST(ROW_NUMBER() OVER (ORDER BY tkt, doc_id) AS BIGINT) AS rn,
       |    SUM(n_symbols) OVER (ORDER BY tkt, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_symbols
       |  FROM pick)
       |SELECT doc_id, tkt, rn, n_symbols,
       |  CAST(cum_symbols AS BIGINT) AS cum_symbols,
       |  CAST((cum_symbols - n_symbols) // 2048 AS BIGINT) AS pack_bin,
       |  CAST((cum_symbols - n_symbols) % 2048 AS BIGINT) AS bin_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }

  /** q132 — gate-overlap matrix: the curation diagnostic behind every
    * "which filters are redundant" ablation (Gopher Table A1 / Dolma
    * report per-filter removal rates and overlaps before fixing a
    * pipeline order): for every pair of the five q95 gates, how many
    * docs fail both, and the failure-set Jaccard. Diagonal rows carry
    * the per-gate marginals.
    *
    * Scale shape: the gates themselves are the memoized [[gateFlags]]
    * verdict table; the matrix is ONE corpus pass — a single hash
    * aggregation computing all 5 marginal + 10 pairwise counters as
    * separate sums — then a 15-row stack and row-local Jaccard
    * arithmetic. No join, no window, no per-pair corpus pass. */
  private val gateNames = Seq("c", "g", "l", "r", "u")
  private def q132(s: SparkSession, d: String): DataFrame = {
    val failCols = gateNames.map(g0 =>
      sum(when(!col(g0), 1L).otherwise(0L)).as(s"f_$g0"))
    val pairCols = for { a <- gateNames; b <- gateNames if a < b }
      yield sum(when(!col(a) && !col(b), 1L).otherwise(0L)).as(s"fb_${a}_$b")
    val allAgg = failCols ++ pairCols
    val aggd = gateFlags(s, d).agg(allAgg.head, allAgg.tail: _*)
    val stackArgs = (for { a <- gateNames; b <- gateNames if a <= b } yield {
      val both = if (a == b) s"f_$a" else s"fb_${a}_$b"
      Seq(s"'$a'", s"'$b'", s"f_$a", s"f_$b", both)
    }).flatten
    aggd.selectExpr(s"stack(15, ${stackArgs.mkString(", ")})" +
        " as (gate_a, gate_b, fail_a, fail_b, fail_both)")
      .withColumn("jaccard", col("fail_both").cast("double") /
        nullif(col("fail_a") + col("fail_b") - col("fail_both"), lit(0L))
          .cast("double"))
      .orderBy("gate_a", "gate_b")
  }
  private def q132Sql: String = {
    val marg = gateNames.map(g0 =>
      s"CAST(SUM(CASE WHEN NOT $g0 THEN 1 ELSE 0 END) AS BIGINT) AS f_$g0")
    val pair = for { a <- gateNames; b <- gateNames if a < b }
      yield s"CAST(SUM(CASE WHEN NOT $a AND NOT $b THEN 1 ELSE 0 END) AS BIGINT) AS fb_${a}_$b"
    val rows = for { a <- gateNames; b <- gateNames if a <= b } yield {
      val both = if (a == b) s"f_$a" else s"fb_${a}_$b"
      s"SELECT '$a' AS gate_a, '$b' AS gate_b, f_$a AS fail_a, f_$b AS fail_b, $both AS fail_both FROM s"
    }
    s"""WITH $gateCtesSql,
       |f AS (
       |  SELECT d.doc_id,
       |    $gateFlagExprsSql
       |  FROM documents d
       |  $gateJoinsSql),
       |s AS (SELECT ${(marg ++ pair).mkString(",\n    ")} FROM f),
       |m AS (${rows.mkString("\n  UNION ALL ")})
       |SELECT gate_a, gate_b, fail_a, fail_b, fail_both,
       |  CAST(fail_both AS DOUBLE)
       |    / CAST(NULLIF(fail_a + fail_b - fail_both, 0) AS DOUBLE) AS jaccard
       |FROM m ORDER BY gate_a, gate_b""".stripMargin
  }

  /** q136 — fill-in-the-middle transform (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * with FIM rate 0.5, split a document into (prefix, middle, suffix)
    * at two uniform cut points and render the PSM ordering
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` — the data-level
    * augmentation that teaches infilling "for free"; unselected docs
    * pass through verbatim (the paper's joint FIM+AR mixture).
    *
    * Determinism (the q50/q53 membership idiom): the apply decision and
    * both cut points come from independent md5 tickets of doc_id, so
    * the transform is a pure function of the data — identical across
    * engines, reruns, and partitionings. Cuts are TOKEN-boundary
    * (word-level FIM): character-level cuts would need byte-identical
    * substring semantics on multi-byte text across engines, while
    * word tokens pass through both engines' array slicing unchanged;
    * cut ∈ [0, n] counts tokens in the prefix, so all three spans may
    * be empty exactly as in the paper's uniform character splits.
    *
    * Scale shape: pure row-local projection — scan → project, zero
    * shuffles beyond the output-determinism sort; at 100 TB this runs
    * in the scan's codegen span at I/O speed. */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("n", size(col("toks")).cast("bigint"))
      .withColumn("tr", expr(
        "cast(conv(substring(md5(concat_ws('|', 'fimr', doc_id)), 1, 15), 16, 10) as bigint)"))
      .withColumn("t1", expr(
        "cast(conv(substring(md5(concat_ws('|', 'fim1', doc_id)), 1, 15), 16, 10) as bigint)"))
      .withColumn("t2", expr(
        "cast(conv(substring(md5(concat_ws('|', 'fim2', doc_id)), 1, 15), 16, 10) as bigint)"))
      .withColumn("fim_applied", col("tr") % 2 === 0 && col("n") >= 2)
      .withColumn("cut_a",
        when(col("fim_applied"), least(col("t1") % (col("n") + 1), col("t2") % (col("n") + 1))))
      .withColumn("cut_b",
        when(col("fim_applied"), greatest(col("t1") % (col("n") + 1), col("t2") % (col("n") + 1))))
    docs
      .withColumn("fim_text", when(col("fim_applied"),
        concat(lit("<fim_prefix>"),
          expr("array_join(slice(toks, 1, cast(cut_a as int)), ' ')"),
          lit("<fim_suffix>"),
          expr("array_join(slice(toks, cast(cut_b as int) + 1, cast(n - cut_b as int)), ' ')"),
          lit("<fim_middle>"),
          expr("array_join(slice(toks, cast(cut_a as int) + 1, cast(cut_b - cut_a as int)), ' ')")))
        .otherwise(col("text")))
      .select(col("doc_id"), col("n").as("n_tokens"), col("fim_applied"),
        col("cut_a"), col("cut_b"), col("fim_text"))
      .orderBy("doc_id")
  }
  private val q136Sql =
    """WITH base AS (
      |  SELECT doc_id, COALESCE(text, '') AS text,
      |    regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
      |  FROM documents),
      |cuts AS (
      |  SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n,
      |    CAST('0x' || substr(md5('fimr|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS tr,
      |    CAST('0x' || substr(md5('fim1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS t1,
      |    CAST('0x' || substr(md5('fim2|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS t2
      |  FROM base),
      |flagged AS (
      |  SELECT doc_id, text, toks, n,
      |    (tr % 2 = 0 AND n >= 2) AS fim_applied,
      |    CASE WHEN tr % 2 = 0 AND n >= 2
      |      THEN LEAST(t1 % (n + 1), t2 % (n + 1)) END AS cut_a,
      |    CASE WHEN tr % 2 = 0 AND n >= 2
      |      THEN GREATEST(t1 % (n + 1), t2 % (n + 1)) END AS cut_b
      |  FROM cuts)
      |SELECT doc_id, n AS n_tokens, fim_applied, cut_a, cut_b,
      |  CASE WHEN fim_applied THEN
      |    -- zero-width slices are guarded: DuckDB's toks[1:0] is NULL,
      |    -- not the empty list, and would null the whole concatenation
      |    '<fim_prefix>' || CASE WHEN cut_a = 0 THEN ''
      |      ELSE array_to_string(toks[1:CAST(cut_a AS INTEGER)], ' ') END ||
      |    '<fim_suffix>' || CASE WHEN cut_b = n THEN ''
      |      ELSE array_to_string(toks[CAST(cut_b AS INTEGER) + 1:CAST(n AS INTEGER)], ' ') END ||
      |    '<fim_middle>' || CASE WHEN cut_b = cut_a THEN ''
      |      ELSE array_to_string(toks[CAST(cut_a AS INTEGER) + 1:CAST(cut_b AS INTEGER)], ' ') END
      |  ELSE text END AS fim_text
      |FROM flagged ORDER BY doc_id""".stripMargin

  /** q137 — EXACT corpus quantiles without a global sort: the Type-1
    * (inverted-CDF) percentiles of the per-doc token-count distribution,
    * `Q(p) = value at rank ⌈p·n⌉ ordering by (n_tokens, doc_id)` — the
    * length profile every corpus card / packing planner reads (q54's
    * profile reports moments; this is the exact-order-statistics member,
    * and the exact twin of approx_percentile-based profiling).
    *
    * The naive plan is `ROW_NUMBER() OVER (ORDER BY n_tokens)` — a
    * single-partition window, fatal at 100 TB. This runs through
    * [[graft.operators.GlobalRank]]'s two-pass bucket construction
    * instead: boundary sample → row-local bucket id → per-bucket
    * B-bounded offsets → rank windows partitioned BY BUCKET. The five
    * target ranks are pure integer arithmetic `(pct·n + 99) div 100`
    * computed on a 5-row literal percentile table (n attached via the
    * enforced ≤1-row scalar), and the probe is an EQUI-join of that
    * broadcast 5-row table against the ranked corpus — no
    * BroadcastNestedLoopJoin (PlanHygieneSpec's ban holds), no corpus
    * window. The oracle states the same semantics with the one-level
    * window, proving the tournament exact by hash equality. */
  private def q137(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"),
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("bigint").as("n_tokens"))
    val ranked = graft.operators.GlobalRank
      .withRank(docs, col("n_tokens"), descending = false,
        tieBreakers = Seq(col("doc_id")), rnName = "rn")
    val pcts = graft.Scalars.withScalar(
      s.createDataFrame(Seq(25, 50, 75, 90, 99).map(Tuple1(_))).toDF("pct"),
      docs.agg(count(lit(1)).as("n")))
      .withColumn("target_rank", expr("(cast(pct as bigint) * n + 99) div 100"))
    ranked.join(broadcast(pcts), col("rn") === col("target_rank"))
      .select(col("pct"), col("target_rank"), col("n_tokens").as("value"), col("n"))
      .orderBy("pct")
  }
  private val q137Sql =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |rk AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rn
      |  FROM docs),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
      |p AS (
      |  SELECT pct, (CAST(pct AS BIGINT) * n + 99) // 100 AS target_rank, n
      |  FROM (SELECT unnest([25, 50, 75, 90, 99]) AS pct), nn)
      |SELECT pct, target_rank, n_tokens AS value, n
      |FROM p JOIN rk ON rk.rn = p.target_rank
      |ORDER BY pct""".stripMargin

  // ---------------------------------------------------------------- q229

  /** q229 — reshard-cost card: modulo vs rendezvous (HRW) hashing when a
    * shard is added. Growing a training-shard layout from S to S+1 is
    * routine at 100 TB; under `h mod S` assignment it rewrites
    * ~S/(S+1) of every byte (here: 8/9 ≈ 89%), under rendezvous
    * hashing (Thaler & Ravishankar 1998, highest-random-weight; the
    * idea behind consistent hashing, Karger et al. 1997) only the docs
    * whose argmax shard IS the new one move (~1/(S+1) ≈ 11%) — an 8×
    * difference in rewrite I/O the card turns into measured corpus
    * numbers, alongside the balance extremes of each strategy at S=8.
    * Complements q100 (which ASSIGNS shards); this prices the
    * RE-assignment policy.
    *
    * Determinism: all assignments are md5-lane integers (the ticket
    * idiom); the rendezvous argmax is a row-local sort of a 9-element
    * literal-range struct array (the q52 sortedCells shape — negated
    * score, shard tie-break), identical in both engines. One corpus
    * pass; two tiny rollups. */
  private def q229(s: SparkSession, d: String): DataFrame = {
    val hx = "cast(conv(substring(md5(concat('shard|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    val scores = "transform(sequence(0, 8), sh -> named_struct(" +
      "'nsc', -cast(conv(substring(md5(concat(cast(doc_id as string), '|', cast(sh as string))), 1, 15), 16, 10) as bigint)," +
      " 'sh', sh))"
    val base = t(s, d, "documents").select(col("doc_id"))
      .withColumn("h", expr(hx))
      .withColumn("scores", expr(scores))
      .select(
        expr("cast(h % 8 as int)").as("mod8"),
        expr("cast(h % 9 as int)").as("mod9"),
        expr("element_at(array_sort(slice(scores, 1, 8)), 1).sh").as("rdv8"),
        expr("element_at(array_sort(scores), 1).sh").as("rdv9"))
      .localCheckpoint(true) // consumers: both strategy rollups
    def card(name: String, c8: String, c9: String): DataFrame = {
      val shards = base.groupBy(col(c8).as("sh")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("max_shard_docs"), min(col("n")).as("min_shard_docs"))
      val moved = base.agg(count(lit(1)).as("n_docs"),
        sum(when(col(c8) =!= col(c9), 1L).otherwise(0L)).as("n_moved"))
      graft.Scalars.withScalar(moved, shards)
        .select(lit(name).as("strategy"), col("n_docs"), col("n_moved"),
          (col("n_moved").cast("double") / col("n_docs").cast("double"))
            .as("moved_frac"),
          col("max_shard_docs"), col("min_shard_docs"))
    }
    card("mod", "mod8", "mod9")
      .unionAll(card("rendezvous", "rdv8", "rdv9"))
      .orderBy("strategy")
  }
  private def q229Sql: String = {
    val hx = "(('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
    val scores = "list_transform(generate_series(0, 8), sh -> {" +
      "'nsc': -(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(sh AS VARCHAR)), 1, 15))::BIGINT)," +
      " 'sh': sh})"
    def card(name: String, c8: String, c9: String): String =
      s"""SELECT '$name' AS strategy,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_docs,
         |  (SELECT CAST(SUM(CASE WHEN $c8 <> $c9 THEN 1 ELSE 0 END) AS BIGINT) FROM base) AS n_moved,
         |  (SELECT CAST(SUM(CASE WHEN $c8 <> $c9 THEN 1 ELSE 0 END) AS DOUBLE) FROM base)
         |    / (SELECT CAST(COUNT(*) AS DOUBLE) FROM base) AS moved_frac,
         |  (SELECT CAST(MAX(n) AS BIGINT) FROM
         |    (SELECT COUNT(*) AS n FROM base GROUP BY $c8)) AS max_shard_docs,
         |  (SELECT CAST(MIN(n) AS BIGINT) FROM
         |    (SELECT COUNT(*) AS n FROM base GROUP BY $c8)) AS min_shard_docs""".stripMargin
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST($hx % 8 AS INTEGER) AS mod8,
       |    CAST($hx % 9 AS INTEGER) AS mod9,
       |    CAST(list_sort(list_transform(generate_series(0, 7), sh -> {'nsc': -(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(sh AS VARCHAR)), 1, 15))::BIGINT), 'sh': sh}))[1].sh AS INTEGER) AS rdv8,
       |    CAST(list_sort($scores)[1].sh AS INTEGER) AS rdv9
       |  FROM documents)
       |SELECT * FROM (${card("mod", "mod8", "mod9")}
       |UNION ALL
       |${card("rendezvous", "rdv8", "rdv9")})
       |ORDER BY strategy""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q229_reshard_cost", q229, Some(q229Sql)),
    Q("q41_redaction", q41, Some(q41Sql)),
    Q("q115_pretrain_pipeline", q115, Some(q115Sql)),
    Q("q132_gate_overlap", q132, Some(q132Sql)),
    Q("q42_dup_clusters", q42, Some(q42Sql)),
    Q("q43_correlated_max", q43, Some(q43Sql)),
    Q("q50_hash_split", q50, Some(q50Sql)),
    Q("q53_stratified_sample", q53, Some(q53Sql)),
    Q("q54_profile", q54, Some(q54Sql)),
    Q("q92_sequence_packing", q92, Some(q92Sql)),
    Q("q93_temperature_sample", q93, Some(q93Sql)),
    Q("q95_quality_funnel", q95, Some(q95Sql)),
    Q("q100_training_shards", q100, Some(q100Sql)),
    Q("q136_fim_transform", q136, Some(q136Sql)),
    Q("q137_exact_quantiles", q137, Some(q137Sql)))
}
