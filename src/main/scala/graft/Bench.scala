package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line of per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 first loads classes and
  * compiles codegen so the timed pass measures steady-state execution, not
  * JVM startup; queries run in sorted order for run-to-run comparability. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      sorted.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    val results = sorted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries release their scratch caches themselves; this drops the
      // (small) final-result caches so 48 queries don't accumulate storage.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
