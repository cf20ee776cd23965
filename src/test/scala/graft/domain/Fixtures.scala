package graft.domain

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Review fixtures mirroring the reference's own 8-sample smoke corpus
  * (nlp_processor_simple.py:319-328) plus edge cases: duplicate ids, null
  * rating/bank, empty + too-short text. */
object Fixtures {

  private def ts(s: String) = Timestamp.valueOf(s)

  def reviews(spark: SparkSession): DataFrame = {
    val rows: Seq[Review] = Seq(
      Review("r1", "p1", "Bank Alpha", "Alpha Centre", "Ali", None, "fr", None, None,
        Some(5), "a month ago", "Le service est excellent et le personnel est tres professionnel",
        1717200000L, translated = false, ts("2024-06-01 10:00:00")),
      Review("r2", "p1", "Bank Alpha", "Alpha Centre", "Sara", None, "fr", None, None,
        Some(1), "2 months ago", "Attente tres longue, le service est mauvais et lent",
        1714600000L, translated = false, ts("2024-06-01 10:00:00")),
      Review("r3", "p2", "Bank Alpha", "Alpha West", "Omar", None, "fr", None, None,
        Some(4), "a week ago", "Personnel agreable, agence propre, bon accueil pour les clients",
        1719300000L, translated = false, ts("2024-06-02 09:00:00")),
      Review("r4", "p3", "Bank Beta", "Beta Main", "Nora", None, "ar", None, None,
        Some(3), "3 weeks ago", "خدمة بنك جيد موظف",
        1718000000L, translated = false, ts("2024-06-02 09:30:00")),
      Review("r5", "p3", "Bank Beta", "Beta Main", "Karim", None, "fr", None, None,
        Some(2), "a day ago", "Des frais tres eleves et une longue attente au guichet",
        1719900000L, translated = false, ts("2024-06-03 08:00:00")),
      // duplicate review_id — later collected_at must lose (keep-first)
      Review("r1", "p1", "Bank Alpha", "Alpha Centre", "Ali", None, "fr", None, None,
        Some(5), "a month ago", "DUPLICATE ROW should be dropped by dedup",
        1717200000L, translated = false, ts("2024-06-09 10:00:00")),
      // null rating → imputed to 3
      Review("r6", "p2", "Bank Alpha", "Alpha West", "Zed", None, "fr", None, None,
        None, "an hour ago", "Application mobile pratique mais quelques problemes de connexion",
        1719990000L, translated = false, ts("2024-06-03 12:00:00")),
      // empty + too-short text → filtered by quality flag
      Review("r7", "p4", "Bank Beta", "Beta North", "Lena", None, "fr", None, None,
        Some(4), "now", "", 1719990100L, translated = false, ts("2024-06-03 12:01:00")),
      Review("r8", "p4", "Bank Beta", "Beta North", "Mo", None, "fr", None, None,
        Some(2), "now", "Bof", 1719990200L, translated = false, ts("2024-06-03 12:02:00")),
      // whitespace-messy text → normalized
      Review("r9", "p5", "Bank Gamma", "Gamma Sud", "Ines", None, "fr", None, None,
        Some(5), "now", "  Tres   bon   service,  merci   beaucoup  ",
        1719990300L, translated = false, ts("2024-06-03 12:03:00")))
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }
}
