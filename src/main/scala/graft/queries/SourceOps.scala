package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source/sink fidelity and warehouse-history operators.
  *
  * q67/q68 close the loop on the reference's file-hop sources and sinks
  * (SURVEY §2.1 S3 JSON sink, S4 CSV sink/source — reference:
  * google_maps_collector.py:185-217, phase2_transformation_pipeline.py:87-89):
  * the engine writes a table out through the text format, reads it back with
  * an explicit schema, and aggregates — the DuckDB oracle computes the same
  * aggregate on the ORIGINAL parquet, so the hash match proves the
  * round-trip is lossless, not just that two reads agree. Doubles survive
  * because Spark emits the shortest round-trip decimal form (Java
  * `Double.toString`) and parses it back to the identical bits; timestamps
  * are projected to DATE for CSV (the default CSV timestamp pattern is
  * millisecond-truncating, a real pitfall worth pinning in a test).
  *
  * q69 is the SCD2 / gaps-and-islands history build (dbt's snapshot
  * pattern): collapse an ordered event log into value-change validity
  * intervals [valid_from, valid_to) with an is_current flag — value-change
  * islands, complementing q19's time-gap sessionization.
  *
  * Scale notes: the round-trip writes shuffle nothing (narrow write of the
  * scan), and the aggregates are plain partial+final hash aggs. q69 is one
  * window pass + one hash agg + one tiny window over runs — all partitioned
  * by user_id, no global sort except the deterministic output ORDER BY.
  */
object SourceOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)
  import Num.{dsumSql, dec, d2d}

  /** Scratch dir for round-trip sinks (shared Scratch convention:
    * md5(sf-dir) + pid + session nonce, so concurrent runs — different
    * scales, two JVMs on one scale, or two sessions in one JVM — never
    * interleave an overwrite with a read). */
  private def rtDir(kind: String, s: SparkSession, d: String): String =
    graft.Scratch.dir(kind, s, d)

  /** CSV sink → CSV source round-trip (S4), proven lossless by aggregating
    * the re-read copy against the parquet-side oracle. */
  private def q67(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("csv", s, d)
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_date"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING," +
        " o_totalprice DOUBLE, o_date DATE")
      .option("header", "true").csv(dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        d2d(sum(dec(col("o_totalprice"), 2))).as("total_price"),
        min(col("o_date")).as("first_date"),
        max(col("o_date")).as("last_date"))
      .orderBy("o_orderstatus")
  }
  private val q67Sql =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${dsumSql("o_totalprice", 2)} AS total_price,
       |  MIN(CAST(o_orderdate AS DATE)) AS first_date,
       |  MAX(CAST(o_orderdate AS DATE)) AS last_date
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** JSON sink → JSON source round-trip (S3), same lossless-by-oracle
    * construction over the customer table. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("json", s, d)
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").json(dir)
    s.read
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT," +
        " c_acctbal DOUBLE, c_mktsegment STRING")
      .json(dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        d2d(sum(dec(col("c_acctbal"), 2))).as("total_bal"),
        min(col("c_name")).as("first_name"),
        max(col("c_name")).as("last_name"))
      .orderBy("c_mktsegment")
  }
  private val q68Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       |  ${dsumSql("c_acctbal", 2)} AS total_bal,
       |  MIN(c_name) AS first_name, MAX(c_name) AS last_name
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** SCD2 validity intervals from the event log: one row per run of equal
    * event_type per user — [valid_from, valid_to) epoch seconds, open
    * (NULL + is_current) on the latest run. lag-compare → change flag →
    * running sum = run id (gaps-and-islands), then one agg per run and a
    * lead() over the per-user run table for the closing bound. */
  private def q69(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val runs = t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1).otherwise(0))
      .withColumn("run", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run"), col("event_type"))
      .agg(min(col("sec")).as("valid_from"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col("user_id"), col("run").cast("int").as("version"),
        col("event_type"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }
  private val q69Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, event_type, sec,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |r AS (
      |  SELECT user_id, event_type, sec,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS run
      |  FROM g),
      |runs AS (
      |  SELECT user_id, CAST(run AS INTEGER) AS version, event_type,
      |    MIN(sec) AS valid_from
      |  FROM r GROUP BY user_id, run, event_type),
      |iv AS (
      |  SELECT user_id, version, event_type, valid_from,
      |    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
      |  FROM runs)
      |SELECT user_id, version, event_type, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM iv ORDER BY user_id, version""".stripMargin

  /** ORC sink → ORC source round-trip: the remaining columnar format in
    * the Spark distribution beside parquet (CSV q67, JSON q68, JDBC q02
    * cover the row formats). Same lossless-by-oracle construction: the
    * engine writes part through ORC, reads it back, aggregates, and the
    * oracle computes the identical aggregate on the ORIGINAL parquet —
    * so the hash match proves type fidelity (BIGINT/INT/DOUBLE/STRING)
    * through the ORC writer/reader pair, not just read-read agreement.
    * Scale: narrow columnar write, partial+final hash agg on re-read. */
  private def q99(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("orc", s, d)
    t(s, d, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_size"), col("p_retailprice"))
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        d2d(sum(dec(col("p_retailprice"), 2))).as("total_price"),
        sum(col("p_size").cast("long")).as("size_sum"),
        min(col("p_name")).as("first_name"),
        max(col("p_name")).as("last_name"))
      .orderBy("p_brand")
  }
  private val q99Sql =
    s"""SELECT p_brand, COUNT(*) AS n_parts,
       |  ${dsumSql("p_retailprice", 2)} AS total_price,
       |  CAST(SUM(p_size) AS BIGINT) AS size_sum,
       |  MIN(p_name) AS first_name, MAX(p_name) AS last_name
       |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q130 — corpus snapshot diff: the versioned-release op (Dolma/Pile
    * ship dated corpus versions; a curation team diffs consecutive
    * snapshots to audit what a recrawl added/removed/changed before
    * retraining). The "next crawl" v2 is DERIVED deterministically from
    * v1 in-query (the q96/q107 shell idiom, restated verbatim in the
    * oracle): an md5 nibble keyed 'v2|doc_id' removes ~1/16 of docs,
    * rewrites ~1/16, and clones ~1/16 as new doc_ids; the diff itself —
    * the operator under test — is a full-outer equi-join of content
    * hashes with a 4-way status CASE.
    *
    * Scale shape: snapshot diff at 100 TB IS this one doc_id-keyed
    * full-outer join (sort-merge after two hash-partitioned scans; with
    * both snapshots bucketed by doc_id it collapses to a zero-shuffle
    * zip). Content comparison rides on fixed-width md5 hashes computed
    * in the scan span, never on text equality across the join. */
  private def q130(s: SparkSession, d: String): DataFrame = {
    val v1 = t(s, d, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("nib",
        substring(md5(concat(lit("v2|"), col("doc_id").cast("string"))), 1, 1))
      .localCheckpoint(true) // consumers: v1 hashes + v2 survivors + v2 clones
    val v2 = v1.filter(col("nib") =!= "0")
      .select(col("doc_id"),
        when(col("nib") === "1", concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
      .unionByName(v1.filter(col("nib") === "2")
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("new crawl "), col("text")).as("text")))
    v1.select(col("doc_id"), md5(col("text")).as("h1"))
      .join(v2.select(col("doc_id"), md5(col("text")).as("h2")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("h1"), col("h2"),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed").as("status"))
      .orderBy("doc_id")
  }
  private val q130Sql =
    """WITH v1 AS (
      |  SELECT doc_id, COALESCE(text, '') AS text,
      |    substr(md5('v2|' || CAST(doc_id AS VARCHAR)), 1, 1) AS nib
      |  FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN nib = '1' THEN text || ' updated' ELSE text END AS text
      |  FROM v1 WHERE nib <> '0'
      |  UNION ALL
      |  SELECT doc_id + 10000000, 'new crawl ' || text FROM v1 WHERE nib = '2'),
      |a AS (SELECT doc_id, md5(text) AS h1 FROM v1),
      |b AS (SELECT doc_id, md5(text) AS h2 FROM v2)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, h1, h2,
      |  CASE WHEN h1 IS NULL THEN 'added'
      |       WHEN h2 IS NULL THEN 'removed'
      |       WHEN h1 = h2 THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q226

  /** q226 — range-partition balance card, the TeraSort/global-sort
    * planning primitive: before a 100 TB total-order write (sorted shard
    * export, Z-order sibling of q65, any `repartitionByRange`), the
    * engine samples the sort key, cuts P−1 boundaries, and the ONLY
    * question that matters is whether the resulting partitions are
    * even — a skewed key silently turns partition 7 into the job's
    * straggler. This card derives the 7 octile boundaries of the sort
    * key through [[PctGate.thresholdsDf]] (ONE pass, one percentile
    * buffer — and above the exact-branch bound, the deterministic
    * ticket sample, i.e. EXACTLY what Spark's RangePartitioner sampling
    * does, made deterministic and oracle-restatable), assigns every doc
    * its partition row-locally (count of boundaries below the key over
    * the 7-element literal array — no join, no sort), and publishes per
    * partition: row count, key range, share, and the imbalance factor
    * n·P/total (1.0 = perfectly even; the straggler multiplier
    * otherwise). Empty partitions are REPORTED (all 8 pids emitted) —
    * range-starving on a discrete skewed key is the failure the card
    * exists to show.
    *
    * All-exact discipline: octile fractions i/8 are exact binary
    * doubles; the boundary percentiles are the PctGate-interpolated
    * values both engines compute identically; assignment is an integer
    * count of double compares; share/imbalance are single divisions of
    * exact integers. */
  private def q226(s: SparkSession, d: String): DataFrame = {
    val keyed = t(s, d, "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("k"))
      .localCheckpoint(true) // consumers: count, boundaries, assignment
    val n = keyed.count()
    val fracs = (1 to 7).map(i => (i / 8.0).toString)
    val names = (1 to 7).map(i => s"b$i")
    val bounds = PctGate.thresholdsDf(keyed, n, "k", fracs, names, "q226")
    val assigned = graft.Scalars.withScalar(keyed, bounds)
      .withColumn("pid",
        expr("size(filter(array(b1, b2, b3, b4, b5, b6, b7), b -> k > b))"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("nd"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
    val pids = s.range(0, 8).select(col("id").cast("int").as("pid"))
    pids.join(assigned, Seq("pid"), "left")
      .select(col("pid"),
        coalesce(col("nd"), lit(0L)).as("n_docs"),
        col("min_key"), col("max_key"),
        (coalesce(col("nd"), lit(0L)).cast("double")
          / lit(n).cast("double")).as("share"),
        (coalesce(col("nd") * 8, lit(0L)).cast("double")
          / lit(n).cast("double")).as("imbalance"))
      .orderBy("pid")
  }
  private def q226Sql: String = {
    val fracs = (1 to 7).map(i => (i / 8.0).toString)
    val names = (1 to 7).map(i => s"b$i")
    s"""WITH kk AS MATERIALIZED (
       |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS k FROM documents),
       |thr AS MATERIALIZED (
       |  ${PctGate.thresholdsSql("kk", "k", fracs, names, "q226")}),
       |p AS (
       |  SELECT kk.doc_id, kk.k,
       |    CAST(len(list_filter([t.b1, t.b2, t.b3, t.b4, t.b5, t.b6, t.b7],
       |      b -> kk.k > b)) AS INTEGER) AS pid
       |  FROM kk CROSS JOIN thr t),
       |g AS (
       |  SELECT pid, CAST(COUNT(*) AS BIGINT) AS nd,
       |    MIN(k) AS min_key, MAX(k) AS max_key
       |  FROM p GROUP BY pid),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM kk)
       |SELECT CAST(i AS INTEGER) AS pid,
       |  COALESCE(g.nd, 0) AS n_docs, g.min_key, g.max_key,
       |  CAST(COALESCE(g.nd, 0) AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE) AS share,
       |  CAST(COALESCE(g.nd * 8, 0) AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE) AS imbalance
       |FROM (SELECT unnest(generate_series(0, 7)) AS i) s
       |LEFT JOIN g ON g.pid = s.i
       |ORDER BY pid""".stripMargin
  }

  // ---------------------------------------------------------------- q230

  /** q230 — schema-evolution round trip: a corpus lake accretes files
    * from pipeline GENERATIONS with different schemas (a recrawl adds a
    * quality-score column; an old column is retired), and the reader
    * must see one unified view — Spark's parquet `mergeSchema`, the
    * schema-on-read contract every long-lived 100 TB lake depends on.
    * Generation 1 writes (doc_id, text, lang, source); generation 2
    * ADDS q_score and DROPS lang — both evolution directions at once.
    * The merged read is asserted (runtime require) to surface exactly
    * the five-column union with NULLs where a generation lacks the
    * field, then aggregated per source; the oracle recomputes the same
    * aggregate straight from the base table (the q67/q99 round-trip
    * proof shape: equality proves the evolved read LOSSLESS, not just
    * well-typed).
    *
    * Scale note: mergeSchema=true reads every file footer at planning
    * time — fine per-generation directory, pathological over millions
    * of small files; production pins the merged schema in a metastore
    * and this op is the audit that the pinned schema matches the files. */
  private def q230(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("schevo", s, d)
    val docs = t(s, d, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("source"),
        (col("n_chars").cast("double") / lit(1024e0)).as("q_score"))
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    val merged = s.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen=1", s"$dir/gen=2")
    require(merged.columns.toSet ==
      Set("doc_id", "text", "lang", "source", "q_score"),
      s"mergeSchema must surface the five-column union, got ${merged.columns.toSeq}")
    merged
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNotNull, 1L).otherwise(0L)).as("n_gen1"),
        sum(when(col("q_score").isNotNull, 1L).otherwise(0L)).as("n_gen2"),
        min(col("q_score")).as("min_score"),
        max(col("q_score")).as("max_score"),
        countDistinct(col("lang")).as("n_langs_gen1"))
      .orderBy("source")
  }
  private val q230Sql =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 0 AND lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gen1,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 1 AND n_chars IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gen2,
      |  MIN(CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS DOUBLE) / 1024e0 END) AS min_score,
      |  MAX(CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS DOUBLE) / 1024e0 END) AS max_score,
      |  CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0 THEN lang END) AS BIGINT) AS n_langs_gen1
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q230_schema_evolution", q230, Some(q230Sql)),
    Q("q226_range_partition_card", q226, Some(q226Sql)),
    Q("q67_csv_roundtrip", q67, Some(q67Sql)),
    Q("q68_json_roundtrip", q68, Some(q68Sql)),
    Q("q69_scd2_intervals", q69, Some(q69Sql)),
    Q("q99_orc_roundtrip", q99, Some(q99Sql)),
    Q("q130_snapshot_diff", q130, Some(q130Sql)),
    Q("q133_compaction_plan", q133, Some(q133Sql)),
    Q("q185_partitioned_layout", q185, Some(q185Sql)))

  /** q185 — hive-partitioned parquet layout round-trip: write the corpus
    * `partitionBy(lang)`, read it back with a lang predicate, aggregate.
    * THE storage decision at 100 TB — a lang/date-partitioned lake means
    * a per-language consumer (CCNet shards, per-lang tokenizers) reads
    * 1/|langs| of the bytes, enforced by the planner, not by discipline.
    * The oracle checks content equivalence against the unpartitioned
    * table; the PLAN property (PartitionFilters prune directories and
    * `lang` leaves the data schema) is asserted in SourceOpsSpec — the
    * q02 pushed-filters discipline applied to the directory axis.
    *
    * Scale shape: the write shuffles nothing (partitionBy fans out at the
    * writer); the filtered read lists only lang=en directories; the one
    * exchange is the |sources|-row aggregate. */
  private def q185(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("pparq", s, d)
    t(s, d, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    s.read.parquet(dir)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).as("total_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("source")
  }
  /** def, not val: referenced by `all`, which is declared above. */
  private def q185Sql =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  /** q133 — output-file compaction plan: the small-files planner every
    * petabyte writer runs before `repartition(n_files)` (the classic
    * Spark/HDFS small-files problem: a 100 TB corpus written at default
    * parallelism produces millions of KB-scale files; the fix is
    * computing per-partition target file counts from byte stats FIRST).
    * Per source: doc/byte totals, the file count hitting a target file
    * size (content bytes as the proxy measure), rows per file, and the
    * mean file size the plan yields. Target is 64 KiB — scaled to the
    * testdata so the ceil arithmetic is load-bearing (multi-file sources
    * AND a remainder file); a production run passes 512 MiB through the
    * same integer formulas.
    *
    * Scale shape: one hash aggregation to |sources| rows, integer-only
    * planning arithmetic after. The plan TABLE is what `repartitionByRange`
    * consumes; assignment itself is q100's shard machinery. */
  private def q133(s: SparkSession, d: String): DataFrame = {
    val target = 65536L
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).as("total_bytes"),
        max(coalesce(col("n_chars"), lit(0L))).as("max_doc_bytes"))
      .select(col("source"), col("n_docs"), col("total_bytes"),
        col("max_doc_bytes"),
        expr(s"greatest(cast(1 as bigint), (total_bytes + $target - 1) div $target)")
          .as("n_files"))
      .withColumn("rows_per_file", expr("(n_docs + n_files - 1) div n_files"))
      .withColumn("avg_file_bytes",
        col("total_bytes").cast("double") / col("n_files").cast("double"))
      .orderBy("source")
  }
  /** def, not val: referenced by `all`, which is declared above. */
  private def q133Sql =
    """WITH s AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS total_bytes,
      |    CAST(MAX(COALESCE(n_chars, 0)) AS BIGINT) AS max_doc_bytes
      |  FROM documents GROUP BY source),
      |p AS (
      |  SELECT *, GREATEST(CAST(1 AS BIGINT),
      |    (total_bytes + 65536 - 1) // 65536) AS n_files
      |  FROM s)
      |SELECT source, n_docs, total_bytes, max_doc_bytes, n_files,
      |  (n_docs + n_files - 1) // n_files AS rows_per_file,
      |  CAST(total_bytes AS DOUBLE) / CAST(n_files AS DOUBLE) AS avg_file_bytes
      |FROM p ORDER BY source""".stripMargin
}
