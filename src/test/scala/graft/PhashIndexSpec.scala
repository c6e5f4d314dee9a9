package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim

import graft.multimodal.{MediaMeta, MediaRecord, Multimodal, PhashIndex}

/** Persisted perceptual-hash index: check resolves band collisions to
  * VERIFIED near-dups against the stored hash, and append ≡ build from
  * the union (the incremental media-ingest contract).
  */
class PhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  // segment-pattern payloads: segment b is high iff (7b + 13·seed) mod 60
  // < 30, so different seeds differ in ≥10 aHash bits (circular offset
  // pattern; validated distances: nearest base pair is 10 apart) while
  // nearOf flips HALF of one low segment's bytes to 255 — exactly one
  // bit crosses the mean, hamming 1 vs its own base
  private def base(seed: Int): Array[Byte] =
    Array.tabulate[Byte](1200)(j =>
      if (((j * 60 / 1200) * 7 + seed * 13) % 60 < 30) 200.toByte
      else 20.toByte)

  private def nearOf(b: Array[Byte]): Array[Byte] = {
    val out = b.clone()
    for (i <- 700 until 710) out(i) = 255.toByte
    out
  }

  private def hashed(rows: Seq[(Long, Array[Byte])]): DataFrame =
    rows.toDF("media_id", "payload")
      .select(col("media_id"), Shim.column(graft.functions.PerceptualHash(
        Shim.expression(col("payload")), 60)).as("phash"))

  private def resultMap(d: DataFrame): Map[Long, Option[Long]] =
    d.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("check finds a near-identical payload of an indexed base and " +
    "rejects unrelated media; append == build from union") {
    val bases = (0 until 6).map(i => (i.toLong, base(i)))
    val probes = Seq(
      (100L, nearOf(base(2))),   // re-encode of indexed media 2 (ham 1)
      (101L, base(30)))          // unrelated pattern (ham ≥ 8 from all)
    val dir = Files.createTempDirectory("graft-ph-idx").toFile
    try {
      val path = dir.getAbsolutePath + "/idx"
      PhashIndex.build(hashed(bases.take(3)), path)
      PhashIndex.append(hashed(bases.drop(3)), path)
      val got = resultMap(PhashIndex.check(spark, path, hashed(probes)))
      // same result as building from the union in one shot
      val path2 = dir.getAbsolutePath + "/idx2"
      PhashIndex.build(hashed(bases), path2)
      assert(got == resultMap(PhashIndex.check(spark, path2, hashed(probes))))
      assert(got(100L).contains(2L),
        s"probe 100 must verify against indexed media 2, got $got")
      assert(got(101L).isEmpty,
        s"unrelated probe must not match, got $got")
      // every probe reports exactly once
      assert(got.keySet == Set(100L, 101L))
    } finally rm(dir)
  }

  test("remove(x) after build(A) answers exactly like build(A minus x)") {
    val bases = (0 until 6).map(i => (i.toLong, base(i)))
    val probes = Seq((100L, nearOf(base(2))), (101L, nearOf(base(4))))
    val dir = Files.createTempDirectory("graft-ph-del").toFile
    try {
      val full = dir.getAbsolutePath + "/full"
      val rest = dir.getAbsolutePath + "/rest"
      PhashIndex.build(hashed(bases), full)
      PhashIndex.build(hashed(bases.filterNot(_._1 == 2L)), rest)
      PhashIndex.remove(spark, full,
        Seq(2L).toDF("media_id"))
      def bands(p: String) =
        spark.read.parquet(s"$p/bands").collect().toSet
      assert(bands(full) == bands(rest),
        "takedown bands must equal the remaining-corpus build's")
      val got = resultMap(PhashIndex.check(spark, full, hashed(probes)))
      assert(got == resultMap(PhashIndex.check(spark, rest, hashed(probes))))
      assert(got(100L).isEmpty,
        "a probe matching only the removed media must stop matching")
      assert(got(101L).contains(4L),
        "probes of remaining media must keep matching")
      // idempotent; removing unknown ids is a no-op
      PhashIndex.remove(spark, full, Seq(2L, 999L).toDF("media_id"))
      assert(bands(full) == bands(rest))
    } finally rm(dir)
  }

  test("videoNearDups pairs media sharing sampled frames and skips " +
    "disjoint ones") {
    // frames are 64-byte slices (every 2nd kept). Noise-like frames (so
    // each frame's aHash is distinct — a shared RAMP would collapse to
    // one hash per media). A and B share their first 768 bytes → 6 of 8
    // kept fingerprints match (validated margin 4 over the 50% gate); C
    // is structurally disjoint from both.
    def noise(n: Int, m: Int, c: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((j * m + (j * j) % 251 + c) % 256).toByte)
    val shared = noise(768, 97, 3)
    val a = shared ++ noise(256, 53, 11)
    val b = shared ++ noise(256, 29, 151)
    val c = noise(1024, 193, 77)
    val fp = Seq((0L, a), (1L, b), (2L, c)).toDF("media_id", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(64).zipWithIndex.collect {
          case (fr, idx) if idx % 2 == 0 =>
            (id, graft.functions.PerceptualHash.hash(fr, 60))
        }
      }.toDF("media_id", "fh").distinct()
    val pairs = Multimodal.videoNearDups(fp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)),
      s"expected exactly the frame-sharing pair, got $pairs")
  }

  test("sceneCounts finds exactly the constructed scene boundary") {
    // two scenes of 8 identical 64-byte frames each: within a scene the
    // frame-over-frame hamming is 0; across the boundary the segment
    // patterns differ by 26 bits (> SCENE_HAM)
    def frame(seed: Int): Array[Byte] =
      Array.tabulate[Byte](64)(j =>
        if (((j * 60 / 64) * 7 + seed * 13) % 60 < 30) 200.toByte
        else 20.toByte)
    def rep(f: Array[Byte], n: Int): Array[Byte] =
      Array.fill(n)(f).flatten
    val twoScenes = rep(frame(0), 8) ++ rep(frame(1), 8)
    val oneScene = rep(frame(3), 16)
    val media = spark.createDataset(Seq(
      MediaRecord(0L, twoScenes, MediaMeta("vid", 0, 0, 0L)),
      MediaRecord(1L, oneScene, MediaMeta("vid", 0, 0, 0L))))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = Multimodal.sceneCounts(media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(0L -> (16L, 2L), 1L -> (16L, 1L)), s"got $got")
  }
}
