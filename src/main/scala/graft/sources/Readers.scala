package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks (SURVEY §2.1 S1-S11): explicit-schema readers — never
  * inferSchema in production paths (the reference's CSV-hop schema drift,
  * SURVEY §1.2, is eliminated by construction) — plus the "latest batch"
  * scan done right: partition listing + pruned read instead of the
  * reference's glob-and-ctime (run_phase2_transformation.py:52-57).
  */
object Readers {

  /** S4: headered CSV with a declared schema. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S1-S3: JSON lines with a declared schema (UTF-8 native — the
    * reference's ensure_ascii workaround is unnecessary). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5: latest-batch scan over a `<base>/<partitionCol>=<value>/` layout.
    * Lists partition directory names on the driver (metadata-only, O(number
    * of batches)) and reads just the newest — the scan itself is
    * partition-pruned; no data files are touched for older batches. */
  def latestPartition(spark: SparkSession, base: String, partitionCol: String)
      : DataFrame = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val parts = fs.listStatus(new Path(base)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
    require(parts.nonEmpty, s"no $prefix* partitions under $base")
    val latest = parts.max
    spark.read.parquet(s"$base/$latest")
  }

  /** S9: dated CSV backup sink (\copy analog). */
  def backupCsv(df: DataFrame, base: String, ds: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(s"$base/$ds")

  /** S7: batched JDBC sink — the reference's psycopg2 execute_values insert
    * loop (complete_data_pipeline_fixed.py:90-140) as Spark's native JDBC
    * writer: each partition opens one connection and writes
    * `batchsize`-row prepared-statement batches in parallel across the
    * cluster, which is the distributed version of the reference's
    * single-connection loop. */
  def jdbcWrite(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("batchsize", batchSize)
      .jdbc(url, table, new java.util.Properties)

  /** S6: JDBC scan (the PG source family). `partitionColumn` + bounds split
    * the table into `numPartitions` range-predicate reads so the scan is
    * parallel and each task streams `fetchsize` rows at a time — the shape
    * that matters when the relational side is large. Catalyst pushes
    * filters into the remote query (PushedFilters on the JDBCRelation). */
  def jdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      fetchSize: Int = 1000): DataFrame = {
    val base = spark.read
      .option("fetchsize", fetchSize)
    partitionColumn match {
      case Some((c, lo, hi, n)) =>
        base.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n)
          .jdbc(url, table, new java.util.Properties)
      case None => base.jdbc(url, table, new java.util.Properties)
    }
  }
}
