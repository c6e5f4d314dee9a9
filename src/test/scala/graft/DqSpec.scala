package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Behavioral checks for the data-quality tier that the uniform driver
  * corpus cannot exercise: the synthetic feed is steady, so
  * dq_volume_anomaly's gate rows are all-false by construction — this
  * spec proves the alarm actually FIRES on a constructed spike (and
  * only there).
  */
class DqSpec extends SparkSpec {

  test("dq_volume_anomaly fires on a constructed spike AND a total " +
      "outage day (calendar spine), only there, never during warm-up") {
    val dir = Files.createTempDirectory("graft_dqv").toString
    val s = spark
    import s.implicits._
    // 30 steady days of 10 events, one TOTAL outage on day 20 (no rows
    // at all — only the calendar spine can surface it), one 30x spike
    // on day 25
    val rows = (0 until 30).flatMap { d =>
      val n = if (d == 20) 0 else if (d == 25) 300 else 10
      (0 until n).map(i => d.toLong * 86400000L + i)
    }
    rows.toDF("ms").select(timestamp_millis(col("ms")).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_volume_anomaly")(spark, dir)
      .collect()
    assert(out.length == 30,
      "every calendar day reports, including the event-less outage day")
    val byDay = out.map(r => r.getAs[Long]("day") -> r).toMap
    assert(byDay(20L).getAs[Long]("n_events") == 0L,
      "the outage day must report zero volume, not vanish")
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[Long]("day")).toSeq.sorted
    assert(flagged == Seq(20L, 25L),
      s"expected the outage day and the spike day, got $flagged")
    assert(out.filter(_.getAs[Long]("n_prev") < 7)
      .forall(!_.getAs[Boolean]("is_anomaly")),
      "warm-up days (n_prev < 7) must not be judged")
  }
}
