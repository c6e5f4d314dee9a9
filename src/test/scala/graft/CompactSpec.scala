package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupState
import graft.multimodal.{EmbedState, Multimodal}
import graft.sim.{Knn, Pq}
import graft.sources.Sources

/** Ingest-partition compaction
  * ([[graft.sources.Sources.foldIngestPartitions]] + the per-artifact
  * wrappers): a daily-slice production loop accretes one
  * `ingest_id=` partition level per append on every persisted state
  * table; the fold must collapse them into the base WITHOUT changing a
  * single answer, and the post-compaction replay of an already-folded
  * slice must be rejected by the append identity guard (the slice IS
  * ingested — re-ingesting it would duplicate state).
  */
class CompactSpec extends SparkSpec {

  private def emb() = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  private def leafDirs(path: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(k => k.isDirectory && k.getName.contains("=")).toSeq
      if (kids.isEmpty) Seq(f) else kids.flatMap(walk)
    }
    walk(new java.io.File(path)).size
  }

  test("compactIvfIndex folds slices into base: answers bit-equal, " +
      "partitions collapse, folded-slice replay fails fast, " +
      "post-compact lifecycle still works") {
    val e = emb()
    val a = e.filter(col("vec_id") < 300)
    val b1 = e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val b2 = e.filter(col("vec_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp-ivf")
    try {
      val p = dir.toString
      Knn.buildIvfIndex(a, p)
      Knn.appendIvfIndex(spark, p, b1, 1L)
      Knn.appendIvfIndex(spark, p, b2, 2L)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      def answers() = Knn.queryIvfIndex(spark, p, q).collect().toSet
      val want = answers()
      val dirsBefore = leafDirs(s"$p/lists")
      val (before, after) = Knn.compactIvfIndex(spark, p)
      assert(before == dirsBefore && after < before,
        s"fold must collapse partitions ($before -> $after)")
      assert(leafDirs(s"$p/lists") == after)
      assert(spark.read.parquet(s"$p/lists")
          .filter(col("ingest_id").cast("long") =!= 0L).count() == 0,
        "no non-base partitions may survive the fold")
      assert(answers() == want, "fold must not change query answers")
      // idempotent: a second fold is a no-op
      assert(Knn.compactIvfIndex(spark, p) == ((after, after)))
      // a folded slice's replay is rejected (its ids live in base now)
      val err = intercept[IllegalArgumentException] {
        Knn.appendIvfIndex(spark, p, b1, 1L)
      }
      assert(err.getMessage.contains("ingestId"))
      // the post-compaction lifecycle is intact: takedown + re-ingest
      Knn.removeFromIvfIndex(spark, p, b2.select("vec_id"))
      Knn.appendIvfIndex(spark, p, b2, 3L)
      assert(answers() == want)
    } finally rm(dir.toFile)
  }

  test("compactIvfPqIndex folds code slices: codes set-identical, " +
      "partitions collapse") {
    val e = emb()
    val isSlice = col("vec_id") % 4 === 3
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp-pq")
    try {
      val p = dir.toString
      Pq.buildIvfPqIndex(e.filter(!isSlice), p)
      Pq.appendIvfPqIndex(spark, p, e.filter(isSlice), 1L)
      def codes() = spark.read.parquet(s"$p/codes")
        .select(col("vec_id"), col("cent_id").cast("long"),
          col("k0"), col("k1"), col("k2"), col("k3"))
        .collect().toSet
      val want = codes()
      val (before, after) = Pq.compactIvfPqIndex(spark, p)
      assert(after < before)
      assert(codes() == want, "fold must not change stored codes")
    } finally rm(dir.toFile)
  }

  test("compactKnnGraphIndex: compact-then-append equals " +
      "append-on-uncompacted — the folded lists/probes drive the " +
      "reverse-probe refresh identically") {
    val e = emb()
    val base = e.filter(col("vec_id") % 4 < 2)
    val s1 = e.filter(col("vec_id") % 4 === 2)
    val s2 = e.filter(col("vec_id") % 4 === 3)
    val d1 = java.nio.file.Files.createTempDirectory("graft-cmp-g1")
    val d2 = java.nio.file.Files.createTempDirectory("graft-cmp-g2")
    try {
      def edges(p: String) = spark.read.parquet(s"$p/edges")
        .collect().toSet
      Knn.buildKnnGraphIndexFrom(base, d1.toString)
      Knn.appendKnnGraph(spark, d1.toString, s1, 1L)
      Knn.appendKnnGraph(spark, d1.toString, s2, 2L)
      Knn.buildKnnGraphIndexFrom(base, d2.toString)
      Knn.appendKnnGraph(spark, d2.toString, s1, 1L)
      val (before, after) = Knn.compactKnnGraphIndex(spark, d2.toString)
      assert(after < before)
      Knn.appendKnnGraph(spark, d2.toString, s2, 2L)
      assert(edges(d2.toString) == edges(d1.toString),
        "append after compaction must produce the same graph as " +
          "append on the uncompacted artifact")
    } finally { rm(d1.toFile); rm(d2.toFile) }
  }

  test("compactDedupState folds buckets+pairs: labels/pairs unchanged, " +
      "new appends still work") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val isS1 = col("doc_id") % 4 === 2
    val isS2 = col("doc_id") % 4 === 3
    val base = docs.filter(!isS1 && !isS2)
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp-ds")
    try {
      val p = dir.toString
      DedupState.buildDedupStateFrom(base, p)
      DedupState.appendDedupState(spark, p, base, docs.filter(isS1), 1L)
      def pairs() = spark.read.parquet(s"$p/pairs")
        .select("a_id", "b_id", "jaccard").collect().toSet
      def labels() = spark.read.parquet(s"$p/labels").collect().toSet
      val (wantPairs, wantLabels) = (pairs(), labels())
      val (before, after) = DedupState.compactDedupState(spark, p)
      assert(after < before)
      assert(pairs() == wantPairs && labels() == wantLabels,
        "fold must not change pairs or labels")
      // folded-slice replay rejected; a NEW slice still ingests
      intercept[IllegalArgumentException] {
        DedupState.appendDedupState(spark, p, base, docs.filter(isS1), 1L)
      }
      DedupState.appendDedupState(spark, p,
        docs.filter(!isS2), docs.filter(isS2), 1L)
      assert(spark.read.parquet(s"$p/labels").count() == docs.count(),
        "post-compaction append must cover the grown corpus")
    } finally rm(dir.toFile)
  }

  test("compactEmbedState folds buckets+pairs+vecs: pairs unchanged") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val isSlice = col("mediaId") % 4 === 3
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp-es")
    try {
      val p = dir.toString
      EmbedState.buildEmbedStateFrom(media.filter(!isSlice), p)
      EmbedState.appendEmbedState(spark, p, media.filter(isSlice), 1L)
      def pairs() = spark.read.parquet(s"$p/pairs")
        .select("a_id", "b_id", "cosine").collect().toSet
      val want = pairs()
      val (before, after) = EmbedState.compactEmbedState(spark, p)
      assert(after < before)
      assert(pairs() == want, "fold must not change verified pairs")
    } finally rm(dir.toFile)
  }

  test("foldIngestPartitions rejects non-ingest layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp-bad")
    try {
      val p = s"$dir/t"
      emb().limit(10).withColumn("g", col("vec_id") % 2)
        .write.partitionBy("g").parquet(p)
      val err = intercept[IllegalArgumentException] {
        Sources.foldIngestPartitions(spark, p)
      }
      assert(err.getMessage.contains("ingest_id"))
    } finally rm(dir.toFile)
  }
}
