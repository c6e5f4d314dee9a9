package graft

import graft.multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mkRecords(n: Int): Seq[MediaRecord] =
    (0 until n).map { i =>
      val payload = Array.tabulate[Byte](64 + i)(j => ((i * 31 + j) % 256).toByte)
      MediaRecord(i.toLong, payload, MediaMeta("img", 8, 8, 0L))
    }

  test("extractFeatures is deterministic, schema-typed, batch-insensitive") {
    val ds = spark.createDataset(mkRecords(50)).repartition(4)
    val a = Multimodal.extractFeatures(ds, batchSize = 7).collect()
      .sortBy(_.mediaId)
    val b = Multimodal.extractFeatures(ds, batchSize = 64).collect()
      .sortBy(_.mediaId)
    assert(a.length == 50)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    // features are an L1-normalized 8-bin histogram
    assert(a.forall(_.features.length == 8))
    assert(a.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
    assert(a.forall(f => f.nBytes >= 64))
  }

  test("extractFeatures preserves partitioning (no shuffle)") {
    val ds = spark.createDataset(mkRecords(50)).repartition(5)
    val out = Multimodal.extractFeatures(ds)
    assert(out.rdd.getNumPartitions == 5)
  }

  test("frameSample keeps every Nth fixed-size frame") {
    val ds = spark.createDataset(mkRecords(3))
    val frames = Multimodal.frameSample(ds, frameBytes = 16, everyN = 2)
      .collect()
    // record 0: 64 bytes → 4 frames → keep idx 0, 2
    val r0 = frames.filter(_.mediaId < 100000L * 1)
    assert(r0.length == 2)
    assert(r0.forall(_.meta.kind == "frame"))
    assert(r0.forall(_.payload.length == 16))
  }

  test("resize rewrites metadata and bounds payload") {
    val ds = spark.createDataset(mkRecords(4))
    val out = Multimodal.resize(ds, 4, 4).collect()
    assert(out.forall(r => r.meta.width == 4 && r.meta.height == 4))
    assert(out.forall(_.payload.length <= 16))
  }

  test("mediaFromDocuments yields payloads matching document bytes") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val n = Tables(spark, sfDir, "documents").count()
    assert(media.count() == n)
    val one = media.filter(_.mediaId == 0L).collect().head
    assert(one.meta.kind == "text" && one.payload.nonEmpty)
  }

  test("contentFingerprints (typed MessageDigest path) equals the " +
      "builtin md5") {
    import org.apache.spark.sql.functions.{col, md5}
    val typed = Multimodal
      .contentFingerprints(Multimodal.mediaFromDocuments(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val builtin = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(org.apache.spark.sql.functions.encode(col("text"), "UTF-8")))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(typed.toSeq == builtin.toSeq)
  }

  test("mm_dedup stays in codegen: no typed boundary in the plan") {
    val d = SparkEntry.queries("mm_dedup")(spark, sfDir)
    d.collect() // AQE finalizes the physical plan only after an action
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") &&
      !plan.contains("MapPartitions"),
      "mm_dedup must use the codegen'd builtin md5, not a typed " +
        "mapPartitions digest")
  }

  test("perceptualPairs (production 4x15-bit layout) pairs constructed " +
    "near-identical payloads and rejects structurally different ones") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.Shim
    // structured base payload: a ramp — segment means rise monotonically,
    // so ~half the 60 aHash bits are set and the hash is informative
    val base = Array.tabulate[Byte](1200)(i => (i * 200 / 1200).toByte)
    // near-identical: perturb a handful of bytes inside TWO segments
    // (a re-encode artifact) — at most a couple of segment means cross
    // the global mean, so hamming stays within the production ham<=3
    val near = base.clone()
    for (i <- 100 until 110) near(i) = (near(i) + 40).toByte
    for (i <- 700 until 710) near(i) = (near(i) - 40).toByte
    // structurally different: the reversed ramp flips every segment's
    // relation to the mean
    val far = base.reverse
    val df = Seq((0L, base), (1L, near), (2L, far))
      .toDF("media_id", "payload")
      .select(col("media_id"), Shim.column(graft.functions.PerceptualHash(
        Shim.expression(col("payload")), 60)).as("phash"))
    val pairs = Multimodal.perceptualPairs(df) // default: 4 bands, ham<=3
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      s"expected exactly the near-identical pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
    // sanity: base vs far really is distant in hamming
    val hs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(2L)) > 3)
  }

  test("gramVectors + blockedCosinePairs pair near-identical payloads " +
      "and ignore unrelated ones; sub-4-byte payloads emit nothing") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8)
      .getBytes("UTF-8")
    val near = base.clone(); near(10) = 'X'.toByte // one byte differs
    val far = ("zq jx vw kp 0123456789 !@#$%^&*() completely other " * 8)
      .getBytes("UTF-8")
    val media = Seq(
      MediaRecord(0L, base, MediaMeta("img", 0, 0, 0L)),
      MediaRecord(1L, near, MediaMeta("img", 0, 0, 0L)),
      MediaRecord(2L, far, MediaMeta("img", 0, 0, 0L)),
      MediaRecord(3L, Array[Byte](1, 2), MediaMeta("img", 0, 0, 0L)))
      .toDS()
    val vecs = Multimodal.gramVectors(media)
    assert(vecs.count() == 3, "payloads under 4 bytes emit no vector")
    val pairs = graft.dedup.Dedup
      .blockedCosinePairs(vecs, Multimodal.MM_COS_TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      s"expected exactly the near-identical pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= Multimodal.MM_COS_TAU)
  }

  test("mm_caption_filter keeps every aligned pair (caption is a prefix " +
    "of its own payload)") {
    val out = SparkEntry.queries("mm_caption_filter")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val aligned = out.filter(p => p._1 == p._2)
    assert(aligned.nonEmpty && aligned.forall(_._3),
      "an aligned caption's tokens all appear in its own payload")
    // and the hard negatives are present and not universally kept
    val negatives = out.filter(p => p._1 != p._2)
    assert(negatives.nonEmpty)
  }

  test("audioGrams: a re-leveled, tail-trimmed copy fingerprints " +
      "identically on the shared prefix; an unrelated clip does not") {
    import spark.implicits._
    def clip(id: Long, bytes: Array[Byte]) =
      MediaRecord(id, bytes, MediaMeta("audio", 0, 0, 0L))
    val a = Array.tabulate(400)(i => ((i * 37) % 100 + 80).toByte)
    val b = a.take(360).map(x => (x + 10).toByte)   // +10 gain, trimmed
    val c = Array.tabulate(400)(i => ((i * 53) % 90 + 70).toByte)
    val ds = Seq(clip(1L, a), clip(2L, b), clip(3L, c)).toDS()
    val grams = Multimodal.audioGrams(ds).collect()
      .groupBy(_.getLong(0))
      .map { case (k, v) =>
        k -> v.map(r => (r.getLong(1), r.getLong(2))).toSet }
    // every gram of the trimmed copy matches the original at its position
    assert(grams(2L).nonEmpty && grams(2L).subsetOf(grams(1L)),
      "re-leveled copy must share every aligned gram with the original")
    // the gate fraction holds: matched = |B| >= min(|A|,|B|)/2
    assert(grams(2L).size * 2 >= math.min(grams(1L).size, grams(2L).size))
    // unrelated clip shares under half of the shorter fingerprint
    val shared = grams(1L).intersect(grams(3L)).size
    assert(shared * 2 < math.min(grams(1L).size, grams(3L).size),
      s"unrelated clip shared $shared grams")
  }

  test("mm_embed_dedup (LSH-candidate scale tier) equals the exact " +
      "all-pairs grid restricted to the dedup radius") {
    val got = SparkEntry.queries("mm_embed_dedup")(spark, sfDir)
      .collect().toSeq
    val want = SparkEntry.queries("mm_embed_neardup")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("cosine") >= 0.9799995)
      .collect().toSeq
    assert(got.nonEmpty, "dedup tier must find the planted near-dups")
    assert(got == want,
      "LSH candidates + exact verify must equal the exact grid at tau=0.98")
  }
}
