package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  private lazy val bronze = Fixtures.reviews(spark)

  test("dedupReviews keeps the earliest collected_at per review_id") {
    val deduped = Clean.dedupReviews(bronze)
    assert(deduped.count() === 9) // 10 rows, one dup id
    val r1 = deduped.filter(col("review_id") === "r1").collect()
    assert(r1.length === 1)
    assert(!r1.head.getAs[String]("text").startsWith("DUPLICATE"))
  }

  test("imputeNulls applies the reference defaults (rating→3)") {
    val imputed = Clean.imputeNulls(bronze)
    val r6 = imputed.filter(col("review_id") === "r6").head()
    assert(r6.getAs[Int]("rating") === 3)
  }

  test("cleanse normalizes whitespace and derives review_time from epoch") {
    val cleaned = Clean.cleanse(Clean.imputeNulls(bronze))
    val r9 = cleaned.filter(col("review_id") === "r9").head()
    assert(r9.getAs[String]("text") === "Tres bon service, merci beaucoup")
    assert(cleaned.filter(col("review_time").isNull).count() === 0)
  }

  test("quality flags: empty_text / too_short / valid bands") {
    val flagged = Clean.withQualityFlag(Clean.cleanse(Clean.imputeNulls(bronze)))
    val byId = flagged.select("review_id", "data_quality_flag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("r7") === "empty_text")
    assert(byId("r8") === "too_short")
    assert(byId("r9") === "valid")
  }

  test("stage composition drops invalid rows and keeps one row per id") {
    val staged = Clean.stage(bronze)
    val ids = staged.select("review_id").collect().map(_.getString(0)).sorted
    assert(ids === Array("r1", "r2", "r3", "r4", "r5", "r6", "r9"))
  }
}
