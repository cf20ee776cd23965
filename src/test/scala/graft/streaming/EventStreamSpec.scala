package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {

  private lazy val eventsDir: String = {
    // Stream source needs a directory; materialize the sf0.001 events there.
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("hourly windowed aggregate matches the batch q20 totals") {
    implicit val s = spark
    val streamed = EventStream.runAvailableNow(spark,
      EventStream.hourlyByType(EventStream.read(spark, eventsDir)), "hourly")
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() === batch.count())
    assert(streamed.agg(sum("n_events")).head().getLong(0) ===
      batch.agg(sum("n_events")).head().getLong(0))
  }

  test("watermarked dedup passes distinct event_ids through") {
    implicit val s = spark
    val streamed = EventStream.runAvailableNow(spark,
      EventStream.dedup(EventStream.read(spark, eventsDir)), "deduped",
      OutputMode.Append())
    assert(streamed.select("event_id").distinct().count() === streamed.count())
    assert(streamed.count() === 1000)
  }

  test("stateful sessionization emits one state per user with sane bounds") {
    implicit val s = spark
    val sessions = EventStream.runAvailableNow(spark,
      EventStream.sessionize(EventStream.read(spark, eventsDir)), "sessions",
      OutputMode.Update())
    val users = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().count()
    assert(sessions.select("user_id").distinct().count() === users)
    assert(sessions.filter(col("duration_sec") < 0).count() === 0)
  }
}
