package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Ev, Session, Streaming}

/** Streaming operators must agree with their batch mirrors on the same
  * data once the watermark has flushed all state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val HOUR = 3600000L
  private val base = 1700000000000L // fixed epoch ms

  // users 1,2; two sessions for user 1 (gap > 30 min), one for user 2
  private val evs = Seq(
    Ev(1L, 1L, base, 1.25),
    Ev(2L, 1L, base + 60000L, 2.50),          // same session (1 min gap)
    Ev(3L, 2L, base + 120000L, 10.00),
    Ev(4L, 1L, base + 3 * HOUR, 4.75),        // new session for user 1
    Ev(5L, 2L, base + 3 * HOUR + 1000L, 0.25) // new session for user 2
  )
  private val flush1 = Ev(900L, 99L, base + 100 * HOUR, 0.0)
  private val flush2 = Ev(901L, 99L, base + 200 * HOUR, 0.0)

  test("windowedAgg (streaming) equals batch aggregation after flush") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val streamed = Streaming.windowedAgg(
      mem.toDF().withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("eventId", "event_id")
        .withColumn("event_type", lit("click")))
    val q = streamed.writeStream.format("memory")
      .queryName("win_agg").outputMode("append").start()
    try {
      mem.addData(evs: _*); q.processAllAvailable()
      mem.addData(flush1); q.processAllAvailable()
      mem.addData(flush2); q.processAllAvailable()
      val got = spark.table("win_agg")
        .filter(col("hour_ms") < base + 50 * HOUR)
        .select("hour_ms", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val expected = spark.createDataset(evs).toDF()
        .groupBy((col("tsMs") - (col("tsMs") % HOUR)).as("hour_ms"))
        .agg(count(lit(1)).as("n_events"),
          Exact.dsum2(col("value")).as("total_value"))
        .select("hour_ms", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("windowedAgg over a FILE stream source equals the batch mirror") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    spark.createDataset(evs).toDF().write.json(s"$dir/in/batch0")
    val schema = spark.createDataset(evs).toDF().schema
    val streamed = Streaming.windowedAgg(
      spark.readStream.schema(schema).json(s"$dir/in/*")
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumn("event_type", lit("click")))
    val q = streamed.writeStream.format("memory")
      .queryName("file_win_agg").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      spark.createDataset(Seq(flush1)).toDF().write.json(s"$dir/in/batch1")
      q.processAllAvailable()
      spark.createDataset(Seq(flush2)).toDF().write.json(s"$dir/in/batch2")
      q.processAllAvailable()
      val got = spark.table("file_win_agg")
        .filter(col("hour_ms") < base + 50 * HOUR)
        .select("hour_ms", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val expected = spark.createDataset(evs).toDF()
        .groupBy((col("tsMs") - (col("tsMs") % HOUR)).as("hour_ms"))
        .agg(count(lit(1)).as("n_events"),
          Exact.dsum2(col("value")).as("total_value"))
        .select("hour_ms", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("stream-stream click-purchase join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = Streaming.clickPurchaseJoin(
      clicks.toDF().withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("userId", "user_id"),
      purchases.toDF().withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("userId", "user_id")
        .withColumnRenamed("eventId", "event_id"),
      windowMs = HOUR)
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      // user 1: purchase at base+30s; clicks inside and outside the window
      purchases.addData(Ev(100L, 1L, base + 30000L, 0.0))
      clicks.addData(
        Ev(1L, 1L, base + 40000L, 1.0),          // inside
        Ev(2L, 1L, base + 30000L, 2.0),          // equal ts → inside
        Ev(3L, 1L, base + 30000L + HOUR, 3.0),   // at end → outside
        Ev(4L, 2L, base + 40000L, 4.0))          // other user → no match
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select("purchase_id", "click_ms", "click_value")
        .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
      assert(got == Seq((100L, base + 30000L, 2.0),
        (100L, base + 40000L, 1.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer matches the batch contract") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = Streaming.sessionize(mem.toDS(), gapMs = 1800000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      mem.addData(evs: _*); q.processAllAvailable()
      mem.addData(flush1); q.processAllAvailable()
      mem.addData(flush2); q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect()
        .filter(_.userId != 99L)
        .sortBy(s => (s.userId, s.sessionId)).toSeq
      val expected = Seq(
        Session(1L, 1L, 2L, base, base + 60000L, 3.75),
        Session(1L, 2L, 1L, base + 3 * HOUR, base + 3 * HOUR, 4.75),
        Session(2L, 1L, 1L, base + 120000L, base + 120000L, 10.00),
        Session(2L, 2L, 1L, base + 3 * HOUR + 1000L,
          base + 3 * HOUR + 1000L, 0.25))
      assert(got == expected)
      // session numbering continues (not restarts) after a timeout flush;
      // the new event must sit AHEAD of the watermark (flush2 - delay)
      mem.addData(Ev(10L, 1L, base + 300 * HOUR, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(11L, 99L, base + 400 * HOUR, 0.0)) // advance watermark
      q.processAllAvailable()
      mem.addData(Ev(12L, 99L, base + 500 * HOUR, 0.0))
      q.processAllAvailable()
      val third = spark.table("sessions").as[Session].collect()
        .filter(s => s.userId == 1L && s.sessionId == 3L)
      assert(third.length == 1 && third.head.startMs == base + 300 * HOUR)
    } finally q.stop()
  }

  test("sessionizer over the real events table equals batch q20") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_ms", "value")
      .orderBy("ts_ms", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val mem = MemoryStream[Ev]
    val q = Streaming.sessionize(mem.toDS(), gapMs = 1800000L)
      .writeStream.format("memory")
      .queryName("sessions_real").outputMode("append").start()
    try {
      mem.addData(evs.toIndexedSeq: _*); q.processAllAvailable()
      val last = evs.map(_.tsMs).max
      mem.addData(Ev(-1L, 999999L, last + 100 * HOUR, 0.0))
      q.processAllAvailable()
      mem.addData(Ev(-2L, 999999L, last + 200 * HOUR, 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_real").as[Session].collect()
        .filter(_.userId != 999999L)
        .map(s => (s.userId, s.sessionId, s.nEvents, s.startMs, s.endMs,
          s.totalValue))
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = SparkEntry.queries("q20_sessionize")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming exact dedup drops duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = mem.toDF()
      .withColumn("event_time", timestamp_millis(col("tsMs")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("eventId")
    val q = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append").start()
    try {
      mem.addData(Ev(1L, 1L, base, 1.0), Ev(1L, 1L, base + 1000L, 2.0),
        Ev(2L, 1L, base + 2000L, 3.0))
      q.processAllAvailable()
      mem.addData(Ev(1L, 1L, base + 3000L, 4.0)) // dup within watermark
      q.processAllAvailable()
      assert(spark.table("stream_dedup").count() == 2) // ids 1 and 2 once
    } finally q.stop()
  }

  test("far-late event emits standalone; open session keeps its place") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = Streaming.sessionize(mem.toDS(), gapMs = 1800000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_farlate").outputMode("append").start()
    try {
      // open session at base+1h → watermark base-1h after this batch
      mem.addData(Ev(1L, 1L, base + HOUR, 5.0)); q.processAllAvailable()
      // 1h earlier than the open session (> gap before it) and still
      // ahead of the watermark, so not dropped upstream
      mem.addData(Ev(2L, 1L, base, 1.0)); q.processAllAvailable()
      mem.addData(flush1); q.processAllAvailable()
      mem.addData(flush2); q.processAllAvailable()
      val got = spark.table("sessions_farlate").as[Session].collect()
        .filter(_.userId == 1L).sortBy(_.sessionId).toSeq
      assert(got == Seq(
        Session(1L, 1L, 1L, base, base, 1.0),
        Session(1L, 2L, 1L, base + HOUR, base + HOUR, 5.0)))
    } finally q.stop()
  }

  test("asofEnrich (streaming) equals the native batch asof join") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AsofEv
    val all = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        (col("event_type") === "purchase").as("isPurchase"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (e, u, t, p) => AsofEv(e, u, t, p) }
      .sortBy(e => (e.tsMs, e.eventId))
    // split into 3 event-time-ordered micro-batches, never cutting inside
    // a timestamp (an equal-ts click/purchase pair must share a batch for
    // the in-batch purchase-first ordering to apply)
    val n = all.length
    def cut(target: Int): Int = {
      var i = target
      while (i < n && all(i).tsMs == all(i - 1).tsMs) i += 1
      i
    }
    val (i1, i2) = (cut(n / 3), cut(2 * n / 3))
    val batches = Seq(all.slice(0, i1), all.slice(i1, i2),
      all.slice(i2, n)).filter(_.nonEmpty)
    val mem = MemoryStream[AsofEv]
    val q = Streaming.asofEnrich(mem.toDS()).writeStream.format("memory")
      .queryName("asof_enrich").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = spark.table("asof_enrich")
        .select("eventId", "purchaseId", "purchaseMs")
        .as[(Long, Option[Long], Option[Long])].collect()
        .sortBy(_._1).toSeq
      val expected = SparkEntry.queries("asof_join_native")(spark, sfDir)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .sortBy(_._1).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }

  test("asofEnrich with idle TTL equals the unbounded form within the " +
      "horizon") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AsofEv
    val all = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        (col("event_type") === "purchase").as("isPurchase"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (e, u, t, p) => AsofEv(e, u, t, p) }
      .sortBy(e => (e.tsMs, e.eventId))
    val n = all.length
    def cut(target: Int): Int = {
      var i = target
      while (i < n && all(i).tsMs == all(i - 1).tsMs) i += 1
      i
    }
    val (i1, i2) = (cut(n / 3), cut(2 * n / 3))
    val batches = Seq(all.slice(0, i1), all.slice(i1, i2),
      all.slice(i2, n)).filter(_.nonEmpty)
    val mem = MemoryStream[AsofEv]
    // ttl far beyond the table's time span: every per-user gap is
    // within the horizon, so output must be IDENTICAL to the unbounded
    // form (proven equal to the batch operator in the spec above)
    val q = Streaming.asofEnrich(mem.toDS(),
        idleTimeoutMs = Some(Long.MaxValue / 4))
      .writeStream.format("memory")
      .queryName("asof_enrich_ttl").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = spark.table("asof_enrich_ttl")
        .select("eventId", "purchaseId", "purchaseMs")
        .as[(Long, Option[Long], Option[Long])].collect()
        .sortBy(_._1).toSeq
      val expected = SparkEntry.queries("asof_join_native")(spark, sfDir)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .sortBy(_._1).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("asofEnrich idle TTL forgets a purchase past the horizon; " +
      "active users keep matching") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AsofEv
    val mem = MemoryStream[AsofEv]
    val q = Streaming.asofEnrich(mem.toDS(),
        idleTimeoutMs = Some(5000L), watermarkDelay = "0 seconds")
      .writeStream.format("memory")
      .queryName("asof_enrich_exp").outputMode("append").start()
    try {
      // user 1 purchases then goes idle; user 2 purchases and stays
      // active (every gap <= ttl), keeping its state alive
      val feed = Seq(
        Seq(AsofEv(11, 1, 1000, true), AsofEv(21, 2, 1000, true)),
        Seq(AsofEv(22, 2, 6000, false)),
        Seq(AsofEv(23, 2, 11000, false)),
        Seq(AsofEv(24, 2, 16000, false)), // wm 11000 > 6000: u1 expires
        Seq(AsofEv(12, 1, 17000, false), AsofEv(25, 2, 17500, false)))
      feed.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("asof_enrich_exp")
        .select("eventId", "purchaseId")
        .as[(Long, Option[Long])].collect().toMap
      assert(got(22L) == Some(21L) && got(23L) == Some(21L) &&
        got(24L) == Some(21L) && got(25L) == Some(21L),
        "active user keeps matching across the whole stream")
      assert(got(12L).isEmpty,
        "idle-past-horizon user's purchase must be forgotten")
    } finally q.stop()
  }

  test("asofEnrich idle TTL anchor is monotone: a late batch of older " +
      "events must not shrink the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AsofEv
    val mem = MemoryStream[AsofEv]
    val q = Streaming.asofEnrich(mem.toDS(),
        idleTimeoutMs = Some(5000L), watermarkDelay = "10 seconds")
      .writeStream.format("memory")
      .queryName("asof_enrich_mono").outputMode("append").start()
    try {
      // u1 purchases at 20000 (anchor 25000); a LATE click at 12000
      // (inside the 10 s watermark delay) arrives next batch — anchoring
      // to that batch's max event time alone would rewind the horizon to
      // 17000 and expire the purchase once the watermark passes it,
      // breaking the "every gap <= ttl => unbounded-identical" contract
      // (u1's true gaps are 20000->24500, all <= ttl)
      val feed = Seq(
        Seq(AsofEv(11, 1, 20000, true)),
        Seq(AsofEv(12, 1, 12000, false)), // late slice, older events
        Seq(AsofEv(31, 3, 33000, false)), // watermark -> 23000 next batch
        Seq(AsofEv(32, 3, 34000, false)), // wm 23000 > shrunk 17000 here
        Seq(AsofEv(13, 1, 24500, false))) // gap 4500 <= ttl: must match
      feed.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("asof_enrich_mono")
        .select("eventId", "purchaseId")
        .as[(Long, Option[Long])].collect().toMap
      assert(got(13L) == Some(11L),
        "purchase expired early: late batch rewound the TTL anchor")
    } finally q.stop()
  }

  test("foreachBatch minhash dedup equals the batch earlier-bucket rule") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_nds").toString
    val flags = scala.collection.mutable.Map[Long, Boolean]()
    val sink = Streaming.minhashDedupSink(s"$tmp/state", 64, 16) { out =>
      out.collect().foreach(r => flags(r.getLong(0)) = r.getBoolean(1))
    }
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      val n = docs.length
      Seq(docs.slice(0, n / 3), docs.slice(n / 3, 2 * n / 3),
        docs.slice(2 * n / 3, n)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // batch rule: doc b is a near-dup candidate iff some a < b shares a
    // band bucket (via the SAME shared signature helper the sink uses)
    val buckets = dedup.Dedup
      .bandBuckets(Tables(spark, sfDir, "documents"))
      .localCheckpoint()
    val expectedDups = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flags.size == docs.length)
    assert(flags.filter(_._2).keySet == expectedDups)
  }

  test("streaming decontamination equals the batch flags across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // the batch query's exact slicing: hash bucket < cut is benchmark
    val all = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        text.Sampling.hashBucket(col("text")).as("hb"))
    val bench = all.filter(col("hb") < text.Decontam.BENCH_CUT)
    val train = all.filter(col("hb") >= text.Decontam.BENCH_CUT)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val got = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val sink = Streaming.decontamSink(text.Decontam.benchmarkGrams(bench)) {
      out => out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2)))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_dcs").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      val n = train.length
      Seq(train.slice(0, n / 3), train.slice(n / 3, 2 * n / 3),
        train.slice(2 * n / 3, n)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val want = SparkEntry.queries("decontam_ngram")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got.toMap == want,
      "streamed flags must equal the batch decontam_ngram rows")
  }

  test("streaming PII scrub equals the batch rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = text.TextOps.piiInjected(Tables(spark, sfDir, "documents"))
      .as[(Long, String)].collect().sortBy(_._1)
    val got = scala.collection.mutable.Map[Long, (String, Long, Long, Long)]()
    val sink = Streaming.piiScrubSink { out =>
      out.collect().foreach(r => got(r.getLong(0)) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_pii").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      val n = docs.length
      Seq(docs.slice(0, n / 3), docs.slice(n / 3, 2 * n / 3),
        docs.slice(2 * n / 3, n)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val want = SparkEntry.queries("text_pii_scrub")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.toMap == want,
      "streamed scrubs must equal the batch text_pii_scrub rows")
  }

  test("minhashDedupSink replays a micro-batch idempotently") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndsr").toString
    var lastFlags = Map.empty[Long, Boolean]
    val sink = Streaming.minhashDedupSink(s"$tmp/state", 64, 16) { out =>
      lastFlags = out.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val docsDF = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").limit(50).localCheckpoint()
    sink(docsDF, 0L)
    val first = lastFlags
    assert(first.nonEmpty)
    // simulate a failure AFTER the state write: the same batch id re-runs
    // and must produce identical flags (its own buckets are not "history")
    sink(docsDF, 1L) // a later batch writes too, then...
    sink(docsDF, 1L) // ...is replayed
    val replayed = lastFlags
    sink(docsDF, 0L) // even the FIRST batch replaying sees no history
    assert(lastFlags == first, "replayed batch 0 must match its first run")
    // batch 1 sees batch 0's state: everything it re-sends is a dup
    assert(replayed.values.forall(identity),
      "batch 1 re-sending batch 0's docs must flag them all")
  }

  test("kmvSketchSink merges slices to the batch sketch; replay is " +
      "idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    var last = Seq.empty[(String, Long, Long, Long)]
    val sink = Streaming.kmvSketchSink(s"$tmp/state") { out =>
      last = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
    }
    val evs = Tables.events(spark, sfDir)
      .select("event_type", "user_id").localCheckpoint()
    sink(evs.filter(col("user_id") % 3 === 0).localCheckpoint(), 0L)
    sink(evs.filter(col("user_id") % 3 === 1).localCheckpoint(), 1L)
    sink(evs.filter(col("user_id") % 3 === 2).localCheckpoint(), 2L)
    val merged = last
    // the streamed merge must equal the one-shot batch sketch exactly
    val expected = SparkEntry.queries("sketch_kmv_users")(spark, sfDir)
      .select("event_type", "k_used", "h_k", "est_users").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(merged == expected)
    // replaying the last slice (crash between state write and checkpoint
    // commit) must re-emit the identical sketch
    sink(evs.filter(col("user_id") % 3 === 2).localCheckpoint(), 2L)
    assert(last == merged)
  }

  test("reservoirSink maintains the exact batch reservoir across slices; " +
      "replay is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_resv").toString
    var last = Seq.empty[(String, Long, Long, Long)]
    val sink = Streaming.reservoirSink(s"$tmp/state") { out =>
      last = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
    }
    val docs = Tables(spark, sfDir, "documents")
      .select("source", "doc_id", "text").localCheckpoint()
    sink(docs.filter(col("doc_id") % 3 === 0).localCheckpoint(), 0L)
    sink(docs.filter(col("doc_id") % 3 === 1).localCheckpoint(), 1L)
    sink(docs.filter(col("doc_id") % 3 === 2).localCheckpoint(), 2L)
    val merged = last
    // the streamed k-min merge must equal the one-shot batch reservoir
    val expected = SparkEntry.queries("sample_reservoir")(spark, sfDir)
      .select("source", "rk", "doc_id", "hb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(merged == expected)
    // replaying the last slice re-emits the identical sample
    sink(docs.filter(col("doc_id") % 3 === 2).localCheckpoint(), 2L)
    assert(last == merged)
  }

  test("volumeAnomalySink folds slices to the batch daily-volume " +
      "report; replay is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vol").toString
    var last = Seq.empty[(Long, Long, Long, Boolean)]
    val sink = Streaming.volumeAnomalySink(s"$tmp/state",
        idCols = Seq("event_id")) { out =>
      last = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq
    }
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts_ms").localCheckpoint()
    sink(ev.filter(col("event_id") % 3 === 0).localCheckpoint(), 0L)
    // slice 1 arrives with INTRA-batch duplicates (at-least-once
    // delivery): the sink must dedup on the declared identity or the
    // duplicated events permanently inflate the daily counters
    val slice1 = ev.filter(col("event_id") % 3 === 1)
    sink(slice1.union(slice1.filter(col("event_id") % 5 === 1))
      .localCheckpoint(), 1L)
    sink(ev.filter(col("event_id") % 3 === 2).localCheckpoint(), 2L)
    val merged = last
    // the streamed cumulative report must equal the one-shot batch query
    val expected = SparkEntry.queries("dq_volume_anomaly")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(merged == expected)
    // replaying the last slice must re-emit the identical report
    sink(ev.filter(col("event_id") % 3 === 2).localCheckpoint(), 2L)
    assert(last == merged)
  }

  test("driftSink folds slices to the batch JSD report; replay is " +
      "idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    var last = Seq.empty[(String, Long, Long)]
    // identity is caller-declared (Nil default = exactly-once): the
    // documents stream declares doc_id as its at-least-once identity
    val sink = Streaming.driftSink(s"$tmp/state",
        idCols = Seq("doc_id")) { out =>
      last = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    }
    val docs = Tables(spark, sfDir, "documents")
      .select("source", "text", "doc_id").localCheckpoint()
    sink(docs.filter(col("doc_id") % 3 === 0).localCheckpoint(), 0L)
    // slice 1 arrives with INTRA-batch duplicates (at-least-once
    // delivery): the sink must dedup on doc identity, or the duplicated
    // tokens permanently inflate the cumulative counts
    val slice1 = docs.filter(col("doc_id") % 3 === 1)
    sink(slice1.union(slice1.filter(col("doc_id") % 5 === 1))
      .localCheckpoint(), 1L)
    sink(docs.filter(col("doc_id") % 3 === 2).localCheckpoint(), 2L)
    val merged = last
    // the streamed cumulative report must equal the one-shot batch query
    val expected = SparkEntry.queries("text_source_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(merged == expected)
    // replaying the last slice (crash between state write and checkpoint
    // commit) must re-emit the identical report
    sink(docs.filter(col("doc_id") % 3 === 2).localCheckpoint(), 2L)
    assert(last == merged)
  }

  test("dqSink folds slices to the batch row-rule report; replay is " +
      "idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    var last = Seq.empty[(String, Long, Long, Boolean)]
    val sink = Streaming.dqSink(s"$tmp/state", idCols = Seq("row_id")) {
        out =>
      last = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
        .toSeq.sortBy(_._1)
    }
    // localCheckpoint PINS the synthetic row identity — the duplicated
    // delivery below then re-ships identical row_ids, as a real
    // at-least-once source would
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount")
      .withColumn("row_id", monotonically_increasing_id())
      .localCheckpoint()
    // an EMPTY first trigger (a normal streaming occurrence) must emit
    // the total all-zero report, not null counters
    sink(li.limit(0).localCheckpoint(), 0L)
    assert(last.forall { case (_, n, v, p) => n == 0L && v == 0L && p })
    sink(li.filter(col("l_orderkey") % 3 === 0).localCheckpoint(), 1L)
    // slice carries INTRA-batch duplicates (at-least-once delivery):
    // the sink must dedup on the declared row identity
    val slice1 = li.filter(col("l_orderkey") % 3 === 1)
    sink(slice1.union(slice1.filter(col("l_orderkey") % 5 === 1))
      .localCheckpoint(), 2L)
    sink(li.filter(col("l_orderkey") % 3 === 2).localCheckpoint(), 3L)
    val merged = last
    // cumulative report == the batch dq_rules row-level lineitem rules
    val expected = SparkEntry.queries("dq_rules")(spark, sfDir)
      .filter(col("rule").isin("lineitem_quantity_range",
        "lineitem_discount_range"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    assert(merged == expected)
    // replaying the last slice re-emits the identical report
    sink(li.filter(col("l_orderkey") % 3 === 2).localCheckpoint(), 3L)
    assert(last == merged)
    // a mistyped identity column must fail FAST, not silently disable
    // the at-least-once guard
    val bad = Streaming.dqSink(s"$tmp/state2",
      idCols = Seq("no_such_col")) { _ => () }
    intercept[IllegalArgumentException] {
      bad(li.localCheckpoint(), 0L)
    }
  }

  test("minhashDedupSink compaction preserves flags and bounds state") {
    def run(every: Int): (Seq[Map[Long, Boolean]], String) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ndc").toString
      val seen = Seq.newBuilder[Map[Long, Boolean]]
      val sink = Streaming.minhashDedupSink(s"$tmp/state", 64, 16,
        compactEvery = every) { out =>
        seen += out.collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      }
      val docs = Tables(spark, sfDir, "documents")
        .select("doc_id", "text").filter(col("doc_id") < 240)
        .localCheckpoint()
      (0 until 6).foreach { b =>
        sink(docs.filter(col("doc_id") >= b * 40 &&
          col("doc_id") < (b + 1) * 40).localCheckpoint(), b.toLong)
      }
      (seen.result(), s"$tmp/state")
    }
    val (flagsCompacted, stateCompacted) = run(every = 2)
    val (flagsPlain, statePlain) = run(every = 100) // never compacts here
    assert(flagsCompacted == flagsPlain,
      "per-batch flags must be identical across compaction boundaries")
    def partDirs(dir: String): Int =
      new java.io.File(dir).listFiles.count(_.getName.startsWith("batch_id="))
    assert(partDirs(statePlain) == 6)
    assert(partDirs(stateCompacted) <= 3,
      "compaction must fold history instead of one partition per batch")
    // the folded state still holds the full bucket history (distinct)
    val a = spark.read.parquet(stateCompacted)
      .select("band", "bh").distinct().count()
    val b = spark.read.parquet(statePlain)
      .select("band", "bh").distinct().count()
    assert(a == b)
  }

  test("minhashDedupSink retention deletes expired partitions at " +
      "compaction (no storage leak)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndr").toString
    val sink = Streaming.minhashDedupSink(s"$tmp/state", 64, 16,
      compactEvery = 4, retentionBatches = Some(2L)) { _ => () }
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 240)
      .localCheckpoint()
    (0 until 9).foreach { b =>
      sink(docs.filter(col("doc_id") >= b * 25 &&
        col("doc_id") < (b + 1) * 25).localCheckpoint(), b.toLong)
    }
    // compactions ran at batch 4 (target 3) and batch 8 (target 7):
    // every partition older than the target must be GONE from disk —
    // including ones past the retention horizon, which the fold skips
    // but the delete pass must still collect
    val parts = new java.io.File(s"$tmp/state").listFiles
      .filter(_.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted.toSeq
    assert(parts.forall(_ >= 7),
      s"partitions older than the last compaction target leaked: $parts")
  }

  test("phashDedupSink flags verified perceptual near-dups against " +
    "history and replays idempotently") {
    import org.apache.spark.sql.graft.Shim
    // PhashIndexSpec's segment-pattern family: bases are mutually >=10
    // hamming apart, nearOf(base) is hamming 1 from its own base only
    def base(seed: Int): Array[Byte] =
      Array.tabulate[Byte](1200)(j =>
        if (((j * 60 / 1200) * 7 + seed * 13) % 60 < 30) 200.toByte
        else 20.toByte)
    def nearOf(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      for (i <- 700 until 710) out(i) = 255.toByte
      out
    }
    def hashed(rows: Seq[(Long, Array[Byte])]) =
      rows.toDF("media_id", "payload")
        .select(col("media_id"), Shim.column(graft.functions.PerceptualHash(
          Shim.expression(col("payload")), 60)).as("phash"))
        .localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("graft_phs").toString
    var lastFlags = Map.empty[Long, Boolean]
    val sink = Streaming.phashDedupSink(s"$tmp/state") { out =>
      lastFlags = out.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val bases = hashed((0 until 6).map(i => (i.toLong, base(i))))
    sink(bases, 0L)
    assert(lastFlags.values.forall(!_),
      s"mutually distant bases must not flag, got $lastFlags")
    // within-batch: near copy AFTER its base id flags, the base does not
    val mixed = hashed(Seq((10L, base(7)), (11L, nearOf(base(7)))))
    sink(mixed, 1L)
    assert(lastFlags == Map(10L -> false, 11L -> true), s"got $lastFlags")
    // vs-history: near copies of indexed bases all flag, verified not
    // just banded (an unrelated pattern stays clean)
    // seed 45's pattern offset (13·45 mod 60 = 45) sits ≥6 from every
    // indexed offset {0,5,13,26,31,39,52} → hamming ≥12 from all history
    val probes = hashed(Seq((100L, nearOf(base(2))), (101L, base(45))))
    sink(probes, 2L)
    assert(lastFlags == Map(100L -> true, 101L -> false), s"got $lastFlags")
    val atFirstRun = lastFlags
    sink(probes, 2L) // replay after a failure post-state-write
    assert(lastFlags == atFirstRun,
      "replayed batch must not see its own state")
  }

  test("audioDedupSink flags re-leveled clips against history and " +
      "within batches, replays idempotently") {
    // the MultimodalSpec clip family: deterministic varied-energy
    // patterns; relevel(+10) preserves the delta-sign contour exactly
    def clip(m: Int): Array[Byte] =
      Array.tabulate(400)(i => ((i * (37 + m * 16)) % 100 + 80).toByte)
    def relevel(b: Array[Byte]): Array[Byte] =
      b.take(360).map(x => (x + 10).toByte)
    def batchOf(rows: Seq[(Long, Array[Byte])]) =
      rows.toDF("media_id", "payload")
    val tmp = java.nio.file.Files.createTempDirectory("graft_aud").toString
    var lastFlags = Map.empty[Long, Boolean]
    val sink = Streaming.audioDedupSink(s"$tmp/state") { out =>
      lastFlags = out.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    // distinct clips: no flags
    sink(batchOf(Seq(0L -> clip(0), 1L -> clip(1))), 0L)
    assert(lastFlags == Map(0L -> false, 1L -> false), s"got $lastFlags")
    // within-batch copy flags the later id only
    sink(batchOf(Seq(10L -> clip(2), 11L -> relevel(clip(2)))), 1L)
    assert(lastFlags == Map(10L -> false, 11L -> true), s"got $lastFlags")
    // vs-history: a re-leveled copy of an indexed clip flags; a fresh
    // pattern does not; a sub-floor tiny clip can never flag
    val probes = batchOf(Seq(100L -> relevel(clip(0)), 101L -> clip(3),
      102L -> clip(0).take(80)))
    sink(probes, 2L)
    assert(lastFlags ==
      Map(100L -> true, 101L -> false, 102L -> false), s"got $lastFlags")
    val atFirstRun = lastFlags
    sink(probes, 2L) // replay after a failure post-state-write
    assert(lastFlags == atFirstRun,
      "replayed batch must not see its own state")
  }

  test("embedDedupSink: union of per-batch emitted pairs over a 3-slice " +
      "corpus equals the batch mm_embed_dedup tier; replay idempotent") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal
      .mediaFromDocuments(spark, sfDir)
      .map(r => (r.mediaId, r.payload))
      .toDF("media_id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val slices = media.grouped(math.max(1, media.length / 3)).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_eds").toString
    var emitted = Set.empty[(Long, Long, Double)]
    var lastOut = Set.empty[(Long, Long, Double)]
    val sink = Streaming.embedDedupSink(s"$tmp/state") { out =>
      lastOut = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      emitted ++= lastOut
    }
    slices.zipWithIndex.foreach { case (s, i) =>
      sink(s.toSeq.toDF("media_id", "payload"), i.toLong)
    }
    val want = SparkEntry.queries("mm_embed_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(emitted.nonEmpty && emitted == want,
      "streamed pair discoveries must union to the batch tier's pairs")
    // replay the LAST batch (crash between state write and checkpoint
    // commit): identical emission, no self-collision through state
    val before = lastOut
    sink(slices.last.toSeq.toDF("media_id", "payload"),
      (slices.size - 1).toLong)
    assert(lastOut == before,
      "a replayed batch must re-emit exactly its original pairs")
  }

  test("knnGraphSink: streamed slices leave the artifact holding the " +
      "frozen-codebook graph over everything ingested; emissions are " +
      "each batch's own edges; replay idempotent") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val base = e.filter(col("vec_id") % 3 === 0)
    val s1 = e.filter(col("vec_id") % 3 === 1)
    val s2 = e.filter(col("vec_id") % 3 === 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kgs").toString
    graft.sim.Knn.buildKnnGraphIndexFrom(base, s"$tmp/g")
    val cents = spark.read.parquet(s"$tmp/g/cents")
    var lastOut = Set.empty[(Long, Long)]
    val sink = Streaming.knnGraphSink(s"$tmp/g") { o =>
      lastOut = o.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    sink(s1.toDF(), 0L)
    assert(lastOut.nonEmpty && lastOut.map(_._1) ==
      s1.select("vec_id").collect().map(_.getLong(0)).toSet,
      "batch emission must cover exactly the batch's own nodes")
    sink(s2.toDF(), 1L)
    def edges() = spark.read.parquet(s"$tmp/g/edges").collect().toSet
    val want = graft.sim.Knn.knnGraphFrom(e, cents).collect().toSet
    assert(edges() == want,
      "after the stream the artifact must hold the frozen-codebook " +
        "graph over base + both slices")
    val out2 = lastOut
    sink(s2.toDF(), 1L) // crash-retry replay of the last batch
    assert(edges() == want && lastOut == out2,
      "a replayed batch must change nothing and re-emit its edges")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(tmp))
  }

  test("minhashDedupSink tolerates a zero-shingle first batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_nde").toString
    var lastFlags = Map.empty[Long, Boolean]
    val sink = Streaming.minhashDedupSink(s"$tmp/state", 64, 16) { out =>
      lastFlags = out.collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    // batch 0: docs too short to shingle → zero-row state (_SUCCESS only)
    sink(Seq((1L, ""), (2L, "two words")).toDF("doc_id", "text"), 0L)
    assert(lastFlags == Map(1L -> false, 2L -> false))
    // batch 1 reads that empty state — must see empty history, not fail
    // parquet schema inference
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").limit(20).localCheckpoint()
    sink(docs, 1L)
    assert(lastFlags.size == 20)
    sink(docs, 2L) // history now real: everything re-sent is a dup
    assert(lastFlags.values.forall(identity))
  }

  test("sessionizer widens, never rewinds, on out-of-order events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = Streaming.sessionize(mem.toDS(), gapMs = 1800000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_ooo").outputMode("append").start()
    try {
      mem.addData(Ev(1L, 1L, base + 600000L, 1.0)); q.processAllAvailable()
      // late event, earlier than the open session's start, same session
      mem.addData(Ev(2L, 1L, base, 1.0)); q.processAllAvailable()
      mem.addData(flush1); q.processAllAvailable()
      mem.addData(flush2); q.processAllAvailable()
      val got = spark.table("sessions_ooo").as[Session].collect()
        .filter(_.userId == 1L).toSeq
      assert(got == Seq(Session(1L, 1L, 2L, base, base + 600000L, 2.0)))
    } finally q.stop()
  }

  test("anomalyFlags over the real events table equals batch q35") {
    import graft.streaming.ZscoreFlag
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_ms", "value")
      .orderBy("ts_ms", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val mem = MemoryStream[Ev]
    val q = Streaming.anomalyFlags(mem.toDS())
      .writeStream.format("memory")
      .queryName("zscore_real").outputMode("append").start()
    try {
      // two slices: flags must be identical to batch regardless of the
      // micro-batch boundary (state carries the trailing buffer across)
      val (a, b) = evs.splitAt(evs.length / 2)
      mem.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("zscore_real").as[ZscoreFlag].collect()
        .map(f => (f.eventId, f.userId, f.tsMs, f.vm, f.nWin))
        .sortBy(_._1).toSeq
      val expected = SparkEntry.queries("q35_anomaly_zscore")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }

  test("gapfill over the real events table equals batch q43 across a " +
      "micro-batch boundary") {
    import graft.streaming.{GapEv, GapRow}
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_ms", "event_type", "value")
      .orderBy("ts_ms", "event_id")
      .collect()
      .map(r => GapEv(r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getString(3) == "purchase") Some(r.getDouble(4)) else None))
    val mem = MemoryStream[GapEv]
    val q = Streaming.gapfill(mem.toDS())
      .writeStream.format("memory")
      .queryName("gapfill_real").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      mem.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("gapfill_real").as[GapRow].collect()
        .map(r => (r.eventId, r.userId, r.tsMs, r.reading, r.filled,
          r.isImputed))
        .sortBy(_._1).toSeq
      val expected = SparkEntry.queries("q43_gapfill")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))
        .sortBy(_._1).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }

  test("gapfill: a late reading never rewinds the carried value; a late " +
      "non-reading older than the state emits unfilled") {
    import graft.streaming.{GapEv, GapRow}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GapEv]
    val q = Streaming.gapfill(mem.toDS())
      .writeStream.format("memory")
      .queryName("gapfill_late").outputMode("append").start()
    try {
      val base = 1700000000000L
      mem.addData(
        GapEv(10L, 1L, base + 2000, Some(5.0)),
        GapEv(11L, 1L, base + 3000, None))
      q.processAllAvailable()
      // late reading OLDER than the carried one, late event older still
      mem.addData(
        GapEv(8L, 1L, base + 1000, Some(3.0)),
        GapEv(7L, 1L, base + 500, None))
      q.processAllAvailable()
      val got = spark.table("gapfill_late").as[GapRow].collect()
        .map(r => r.eventId -> ((r.filled, r.isImputed))).toMap
      assert(got(11L) == ((Some(5.0), true)), "in-order fill")
      assert(got(8L) == ((Some(3.0), false)),
        "a reading event fills with itself even when late")
      assert(got(7L) == ((None, false)),
        "older-than-state event must not be filled from its future")
      // state must still carry the NEWEST reading
      mem.addData(GapEv(12L, 1L, base + 4000, None))
      q.processAllAvailable()
      val after = spark.table("gapfill_late").as[GapRow].collect()
        .map(r => r.eventId -> r.filled).toMap
      assert(after(12L) == Some(5.0), "late older reading didn't rewind")
    } finally q.stop()
  }

  test("scd2Intervals over the real events table equals batch q33") {
    import graft.streaming.{ScdEv, Scd2Row}
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts_ms")
      .orderBy("ts_ms", "event_id")
      .collect()
      .map(r => ScdEv(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val mem = MemoryStream[ScdEv]
    val q = Streaming.scd2Intervals(mem.toDS())
      .writeStream.format("memory")
      .queryName("scd2_real").outputMode("append").start()
    try {
      mem.addData(evs.toIndexedSeq: _*); q.processAllAvailable()
      val last = evs.map(_.tsMs).max
      mem.addData(ScdEv(-1L, 999999L, "flush", last + 100 * HOUR))
      q.processAllAvailable()
      mem.addData(ScdEv(-2L, 999999L, "flush", last + 200 * HOUR))
      q.processAllAvailable()
      val got = spark.table("scd2_real").as[Scd2Row].collect()
        .filter(_.userId != 999999L)
        .map(r => (r.eventId, r.userId, r.eventType, r.validFrom,
          r.validTo, r.isCurrent))
        .sortBy(_._1).toSeq
      val expected = SparkEntry.queries("q33_scd2_intervals")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
        .sortBy(_._1).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }

  test("scd2Intervals repairs a late historical chain within a batch") {
    import graft.streaming.{ScdEv, Scd2Row}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ScdEv]
    val q = Streaming.scd2Intervals(mem.toDS())
      .writeStream.format("memory")
      .queryName("scd2_late").outputMode("append").start()
    try {
      // open version at t=base+1h (watermark = base-1h, so both late
      // events below stay inside the 2h watermark)
      mem.addData(ScdEv(10L, 1L, "a", base + HOUR))
      q.processAllAvailable()
      // two LATE versions arrive together: they must chain among
      // themselves and the last must close at the open version's ts
      mem.addData(ScdEv(3L, 1L, "a", base),
        ScdEv(7L, 1L, "a", base + HOUR / 2))
      q.processAllAvailable()
      val got = spark.table("scd2_late").as[Scd2Row].collect()
        .map(r => (r.eventId, r.validFrom, r.validTo, r.isCurrent))
        .sortBy(_._1).toSeq
      assert(got == Seq(
        (3L, base, Some(base + HOUR / 2), false),
        (7L, base + HOUR / 2, Some(base + HOUR), false)))
    } finally q.stop()
  }

  test("ohlcBars over the real events table equals batch q34") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_ms", "value")
      .orderBy("ts_ms", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val mem = MemoryStream[Ev]
    val bars = Streaming.ohlcBars(
      mem.toDF()
        .withColumnRenamed("eventId", "event_id")
        .withColumnRenamed("userId", "user_id")
        .withColumnRenamed("tsMs", "ts_ms"))
    val q = bars.writeStream.format("memory")
      .queryName("ohlc_real").outputMode("append").start()
    try {
      mem.addData(evs.toIndexedSeq: _*); q.processAllAvailable()
      val last = evs.map(_.tsMs).max
      mem.addData(Ev(-1L, 999999L, last + 100 * HOUR, 0.0))
      q.processAllAvailable()
      mem.addData(Ev(-2L, 999999L, last + 200 * HOUR, 0.0))
      q.processAllAvailable()
      val got = spark.table("ohlc_real")
        .filter(col("user_id") =!= 999999L)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = SparkEntry.queries("q34_resample_ohlc")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got.size == expected.size)
      assert(got == expected)
    } finally q.stop()
  }
}
