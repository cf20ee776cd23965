package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming token-budget accountant — the ingest-side arm of q110's
  * batch token-budget fill (pretraining mixes are budgeted in TOKENS per
  * source; once a source's budget fills, further ingest of that source
  * is wasted crawl + storage). The batch query selects in deterministic
  * md5-ticket order because batch can order globally; an ONLINE
  * accountant cannot see the future, so the only well-defined streaming
  * semantics is greedy fill in ARRIVAL order: a document is admitted iff
  * its source's running token total BEFORE the doc is still inside the
  * budget — the identical boundary rule as q110 (`cum − n_tokens <
  * budget`: the doc that crosses the boundary is kept).
  *
  * PERSISTED state is ONE Long per source (the running token total) —
  * bounded by the source vocabulary, never corpus-proportional; a year of
  * 100 TB/day ingest carries the same checkpoint state as day one. The
  * TRANSIENT bound is different and must be sized: the accountant buffers
  * each source's slice of the current micro-batch (`rows.toSeq`) to sort
  * it, so executor memory per group is proportional to the micro-batch —
  * a single-source flood in one trigger can exceed executor memory even
  * though the checkpoint stays one Long. Cap the micro-batch with
  * `maxFilesPerTrigger` (exposed on [[read]]/[[runAccountant]]) so the
  * largest per-source slice fits; feeds that are already time-ordered at
  * the source could instead process the iterator in arrival order and
  * drop the in-batch sort (trading determinism-under-partition-reorder
  * for O(1) memory). The token projection is the row-local q110 tokenizer
  * shared verbatim with [[batchTwin]], so the spec proves stream ≡ batch
  * by construction. Within a micro-batch the group's rows are sorted
  * (event time, doc_id) — the same order the twin's window uses — so
  * admissions are deterministic under any in-batch file/partition order. Every doc is
  * EMITTED with its verdict (admitted or not) and running total: the
  * rejected rows are the accountant's observability — their per-source
  * volume is what tells an operator to stop paying for a source's crawl.
  *
  * Sink is the parquet FILE sink with its transactional `_spark_metadata`
  * manifest + checkpoint: exactly-once per micro-batch, idempotent under
  * retry (the DedupStream sink discipline).
  */
object BudgetStream {

  final case class BudgetState(cum: Long)
  final case class AdmitOut(doc_id: Long, source: String, n_tokens: Long,
      cum_tokens: Long, budget: Long, admitted: Boolean)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType), StructField("ts", TimestampType)))

  /** File-source stream over a parquet directory of timestamped docs. */
  def read(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  /** Row-local token projection — q110's tokenizer, shared by the stream
    * and the batch twin. */
  def tokenProjection(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      unix_timestamp(col("ts")).as("sec"),
      size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
        .cast("long").as("n_tokens"))

  /** The stateful accountant: per-source running totals via
    * flatMapGroupsWithState, greedy-fill admission, every doc emitted
    * with its verdict. `budgets` is the mixture plan's per-source token
    * budget (fixed ahead of ingest — the realistic contract: a stream
    * cannot know a source's final total, so a RELATIVE budget like
    * q110's 30% is a batch-only construct). */
  def accountant(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val typed = tokenProjection(docs)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("sec"))
      .as[(String, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, AdmitOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[BudgetState]) =>
          val b = budgets.getOrElse(src, defaultBudget)
          var cum = state.getOption.fold(0L)(_.cum)
          // Batch-bounded sort: (event time, doc_id) — the twin's order.
          // NOTE: buffers the group's whole micro-batch slice; see the
          // object scaladoc's transient-memory bound + maxFilesPerTrigger.
          val out = rows.toSeq.sortBy(r => (r._4, r._2)).map {
            case (_, id, nt, _) =>
              val admitted = cum < b
              cum += nt
              AdmitOut(id, src, nt, cum, b, admitted)
          }
          state.update(BudgetState(cum))
          out.iterator
      }.toDF()
  }

  /** Drive the accountant over a file-source dir with the exactly-once
    * parquet file sink; AvailableNow drains what's there and stops, so a
    * caller can interleave writes and runs to shape micro-batches (the
    * DedupStream refresh-spec pattern). */
  def runAccountant(spark: SparkSession, inDir: String, outDir: String,
      ckptDir: String, budgets: Map[String, Long], defaultBudget: Long,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val q = accountant(read(spark, inDir, maxFilesPerTrigger), budgets,
        defaultBudget)(spark)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The batch twin the spec compares against: the SAME projection and
    * admission predicate over a per-source (event time, doc_id) prefix
    * sum. This is the SPEC tool (one window partition per source); the
    * production batch path is q110 itself, whose two-level bucket-offset
    * decomposition bounds every window partition — see
    * `AssemblyOps.q110`. */
  def batchTwin(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bdf = budgets.toSeq.toDF("source", "b")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("sec"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenProjection(docs)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(bdf), Seq("source"), "left")
      .withColumn("budget", coalesce(col("b"), lit(defaultBudget)))
      .withColumn("admitted",
        col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("budget"), col("admitted"))
  }
}
