package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `events.ts` physical-encoding robustness.
  *
  * The driver regenerated `events.parquet` mid-round-7 switching `ts` from
  * int64 epoch-nanos (read as LongType under `nanosAsLong=true`) to
  * microsecond TIMESTAMP_NTZ, which silently dropped all 16 events queries
  * from the correctness gate. `Tables.events` now branches on the dtype the
  * reader actually produced; this spec writes tiny fixtures in BOTH
  * encodings (plus adjusted-to-UTC TIMESTAMP) from the same logical instants
  * and asserts the derived `ts_ms` is identical — so the loader can never
  * silently lose an encoding again.
  */
class EventsEncodingSpec extends SparkSpec {

  // epoch micros chosen to exercise sub-millisecond truncation (floor, the
  // DuckDB epoch_ms semantics): x999 µs must floor to the same ms as x000 µs
  private val micros = Seq(1704067200000000L, 1704067200000999L,
    1704153599999999L, 1710000000123456L)

  private def writeFixtures(): (String, String, String) = {
    val base = Files.createTempDirectory("graft_events_enc").toString
    import spark.implicits._
    val ids = micros.indices.map(_.toLong)

    // (a) nanos-as-long: the pre-r7 layout surfaces ts as a raw Long of
    // epoch nanos; a plain int64 column round-trips to the same dtype
    ids.zip(micros).toDF("event_id", "us")
      .select($"event_id", ($"us" * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")

    // (b) micros TIMESTAMP_NTZ: the r7-regenerated layout
    // (isAdjustedToUTC=false, timeUnit=microseconds)
    ids.zip(micros).toDF("event_id", "us")
      .select($"event_id",
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")

    // (c) adjusted-to-UTC TIMESTAMP, the third plausible writer choice
    ids.zip(micros).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
      .write.mode("overwrite").parquet(s"$base/tz/events.parquet")

    (s"$base/nanos", s"$base/ntz", s"$base/tz")
  }

  test("Tables.events derives identical ts_ms from nanos-long, " +
    "micros-NTZ, and micros-TZ encodings") {
    val (nanosDir, ntzDir, tzDir) = writeFixtures()
    def tsMs(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .select(col("event_id"), col("ts_ms"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    val expected = micros.indices.map(i => (i.toLong, micros(i) / 1000L))
    assert(tsMs(nanosDir) === expected)
    assert(tsMs(ntzDir) === expected)
    assert(tsMs(tzDir) === expected)
  }

  test("the shipped testdata events table loads and ts_ms is epoch millis") {
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts_ms").dataType === LongType)
    val row = e.agg(min("ts_ms"), max("ts_ms")).collect().head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // sanity window: 2000-01-01 .. 2100-01-01 in epoch millis
    assert(lo > 946684800000L && hi < 4102444800000L)
  }
}
