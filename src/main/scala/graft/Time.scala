package graft

/** Per-query wall-time probe for perf iteration (two rounds so the second
  * reading is warm/steady-state):
  *   tools/run.sh graft.Time [sfDir] [nameSubstring...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val filters = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
    (1 to 2).foreach { round =>
      qs.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[$round] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
