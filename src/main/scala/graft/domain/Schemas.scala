package graft.domain

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Data model of the bank-review warehouse (SURVEY §1, FIXTURES.md).
  *
  * `Review` mirrors the collector record (reference
  * `1_data_collection/collectors/google_maps_collector.py:36-53`);
  * `BankLocation` its sibling (`:20-34`). Explicit StructTypes everywhere —
  * the reference's CSV-hop schema drift (SURVEY §1.2) is eliminated by
  * construction: `spark.read.schema(...)`, never inferSchema.
  */
final case class Review(
    review_id: String,
    place_id: String,
    bank_name: String,
    branch_name: String,
    author_name: String,
    author_url: Option[String],
    language: String,
    original_language: Option[String],
    profile_photo_url: Option[String],
    rating: Option[Int],
    relative_time_description: String,
    text: String,
    time: Long, // unix epoch seconds (google_maps_collector.py:50)
    translated: Boolean,
    collected_at: Timestamp)

final case class BankLocation(
    place_id: String,
    name: String,
    bank_name: String,
    address: String,
    city: String,
    latitude: Double,
    longitude: Double,
    rating: Option[Double],
    user_ratings_total: Option[Int],
    phone_number: Option[String],
    website: Option[String],
    opening_hours: Option[Seq[String]])

object Schemas {
  val review: StructType = StructType(Seq(
    StructField("review_id", StringType, nullable = false),
    StructField("place_id", StringType, nullable = false),
    StructField("bank_name", StringType, nullable = true),
    StructField("branch_name", StringType, nullable = true),
    StructField("author_name", StringType, nullable = true),
    StructField("author_url", StringType, nullable = true),
    StructField("language", StringType, nullable = true),
    StructField("original_language", StringType, nullable = true),
    StructField("profile_photo_url", StringType, nullable = true),
    StructField("rating", IntegerType, nullable = true),
    StructField("relative_time_description", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("time", LongType, nullable = true),
    StructField("translated", BooleanType, nullable = true),
    StructField("collected_at", TimestampType, nullable = true)))

  val bankLocation: StructType = StructType(Seq(
    StructField("place_id", StringType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("bank_name", StringType, nullable = true),
    StructField("address", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true),
    StructField("rating", DoubleType, nullable = true),
    StructField("user_ratings_total", IntegerType, nullable = true),
    StructField("phone_number", StringType, nullable = true),
    StructField("website", StringType, nullable = true),
    StructField("opening_hours", ArrayType(StringType), nullable = true)))
}

/** The warehouse's semantic constants, centralized (they are duplicated
  * across ≥6 reference files — SURVEY §2.7 "threshold CASE ladders";
  * canonical values from dbt_project.yml:56-59 and
  * nlp_processor_simple.py:96-102). */
object Thresholds {
  val sentimentPositive = 0.1   // label > → Positive
  val sentimentNegative = -0.1  // label < → Negative
  val sentimentVeryPositive = 0.5
  val sentimentVeryNegative = -0.5
  val ratingHigh = 4            // rating >= → High / satisfied
  val ratingLow = 2             // rating <= → Low / dissatisfied
  val minTextLength = 10        // shorter → too_short quality flag
  val maxTextLength = 5000      // longer → too_long quality flag
  val ratingImputeDefault = 3   // fillna value (run_phase2_transformation.py:78)
  val lexiconHitWeight = 0.2    // sentiment score per net keyword hit
  val lexiconScoreClamp = 0.8   // |score| ceiling (test_phase2_simple.py:97)
  val languageUnknownConfidence = 0.3 // nlp_processor_simple.py:71
  val sessionGapSeconds = 1800
}
