package graft

/** Ad-hoc timing of a query subset with the Bench methodology (3 runs,
  * median, count() action, clearCache + GC between runs) — the
  * optimization loop's fast inner measurement; the committed artifact
  * numbers still come from [[Bench]] over the full battery.
  *
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.TimeQ q252 q258 ...
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      picked.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    System.gc()
    val results = picked.map { case (name, fn) =>
      val dt = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"FAIL $name: ${e.getMessage}") }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }.sorted.apply(1)
      System.gc()
      name -> dt
    }
    spark.stop()
    results.foreach { case (n, t) =>
      println(f"$n%-40s ${t}%8.3f s")
    }
    println(f"TOTAL ${results.map(_._2).sum}%.3f s over ${results.size} queries")
  }
}
