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
}
