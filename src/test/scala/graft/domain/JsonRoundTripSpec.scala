package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.7 array/map/json parity: the topic_distribution JSONB round-trip
  * (nlp_processor_simple.py:280 json.dumps → Postgres JSONB → dbt
  * ::jsonb cast at fact_reviews.sql:140) as native MapType with
  * to_json at sinks / from_json at sources. */
class JsonRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("MapType topic distribution survives to_json/from_json round trip") {
    val dist = Seq(
      (1L, Map("topic_0" -> 0.7, "topic_1" -> 0.3)),
      (2L, Map("topic_0" -> 0.1, "topic_1" -> 0.9)))
      .toDF("doc_id", "topic_distribution")
    val asJson = dist.withColumn("j", to_json(col("topic_distribution")))
    val back = asJson.withColumn("m",
      from_json(col("j"), MapType(StringType, DoubleType)))
    val rows = back.select("doc_id", "topic_distribution", "m").collect()
    rows.foreach { r =>
      assert(r.getMap[String, Double](1) === r.getMap[String, Double](2))
    }
  }

  test("null map casts to typed null (dim_branch NULL::JSONB analog)") {
    val df = Seq(1).toDF("x")
      .withColumn("opening_hours", lit(null).cast("map<string,string>"))
    assert(df.schema("opening_hours").dataType ===
      MapType(StringType, StringType))
    assert(df.head().isNullAt(1))
  }
}
