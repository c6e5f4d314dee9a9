package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-input totality — the shapes a 100 TB run always hits:
  * an EMPTY shard (a date partition with no rows, a source with no
  * documents) must flow through the operators as zero/empty results,
  * never an exception; and a dataset whose later files ADDED a column
  * (schema drift at ingest) must read as the union schema.
  */
class RobustnessSpec extends SparkSpec {

  /** A temp data dir whose tables have the REAL schemas but zero rows. */
  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // One representative per machinery family: hash-agg dedup, kernel
  // explode + banded self-join, text kernels, relational agg/window,
  // broadcast-scalar embedding stats, bruteforce BNLJ, perceptual
  // kernel, per-source window sampling, postings self-join, gaps-and-
  // islands, fixed-point drift grid.
  private val total = Seq(
    "dedup_exact", "dedup_minhash_lsh", "text_stats", "q01_agg",
    "q07_window", "emb_stats", "knn_bruteforce", "mm_phash",
    "sample_reservoir", "dedup_ngram_jaccard", "mm_audio_vad",
    "text_source_drift", "q49_cumulative_users", "sample_interleave",
    "q20_sessionize", "text_tokens", "pack_sequences",
    "text_readability", "emb_mmr_select", "q55_min_cost_supplier",
    "q60_large_orders")

  test("empty shards flow through the operator families as empty results") {
    for (name <- total) {
      val rows = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(rows == 0L, s"$name returned $rows rows on an empty shard")
    }
  }

  test("global-aggregate queries stay total on empty input (0-or-1 " +
      "summary rows, no exception)") {
    // these legitimately emit a single all-null/zero summary row (global
    // aggregates over zero rows) — totality, not emptiness, is the claim
    for (name <- Seq("q18_corr_scalar", "corpus_stats", "text_zipf"))
      assert(SparkEntry.queries(name)(spark, emptyDir).count() <= 1L,
        s"$name should reduce an empty corpus to at most one summary row")
  }

  test("dq_drift stays total on empty input: the full metric grid with " +
      "zero counts and NULL means (no ANSI DIVIDE_BY_ZERO)") {
    val rows = SparkEntry.queries("dq_drift")(spark, emptyDir).collect()
    assert(rows.length == 3, "the metric report must not lose rows")
    assert(rows.forall(r => r.getAs[Long]("n_ref") == 0L &&
      r.getAs[Long]("n_new") == 0L))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("ref_mean_micro")) &&
      r.isNullAt(r.fieldIndex("new_mean_micro")) &&
      r.isNullAt(r.fieldIndex("diff_micro"))),
      "an empty slice has no mean — NULL, never a division error")
  }

  test("dq_rules stays total on empty input: the full fixed-rule report " +
      "with zero counts, all rules passing") {
    val rows = SparkEntry.queries("dq_rules")(spark, emptyDir)
      .collect()
    assert(rows.length == 9, "the rule report must not lose rows")
    assert(rows.forall(_.getAs[Boolean]("pass")),
      "zero rows violate nothing")
  }

  test("schema-evolved parquet (a later file adds a column) reads as the " +
      "union schema with nulls for the old file") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir)
    Seq((2L, "b", 9L)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val back = graft.sources.Sources.readParquet(spark, dir,
      mergeSchema = true)
    assert(back.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")),
      "pre-evolution row must surface the new column as null")
    assert(rows(1).getLong(rows(1).fieldIndex("v2")) == 9L)
  }

  test("every persisted-artifact append/remove tolerates an EMPTY " +
      "slice — the idle-batch shape of a real ingest loop") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val media = graft.multimodal.Multimodal.mediaFromDocuments(spark, sfDir)
    val p = java.nio.file.Files.createTempDirectory("graft-empty").toString
    try {
      graft.sim.Knn.buildKnnGraphIndexFrom(e, s"$p/g")
      val edges0 = spark.read.parquet(s"$p/g/edges").count()
      graft.sim.Knn.appendKnnGraph(spark, s"$p/g", e.limit(0), 1L)
      graft.sim.Knn.removeFromKnnGraph(spark, s"$p/g",
        e.limit(0).select("vec_id"))
      assert(spark.read.parquet(s"$p/g/edges").count() == edges0,
        "empty graph append/remove must leave edges unchanged")
      graft.sim.Pq.buildIvfPqIndex(e, s"$p/pq")
      val codes0 = spark.read.parquet(s"$p/pq/codes").count()
      graft.sim.Pq.appendIvfPqIndex(spark, s"$p/pq", e.limit(0), 1L)
      graft.sim.Pq.removeFromIvfPqIndex(spark, s"$p/pq",
        e.limit(0).select("vec_id"))
      assert(spark.read.parquet(s"$p/pq/codes").count() == codes0)
      graft.multimodal.EmbedState.buildEmbedStateFrom(media, s"$p/es")
      val pairs0 = spark.read.parquet(s"$p/es/pairs").count()
      graft.multimodal.EmbedState.appendEmbedState(spark, s"$p/es",
        media.limit(0), 1L)
      assert(spark.read.parquet(s"$p/es/pairs").count() == pairs0)
      graft.dedup.DedupState.buildDedupStateFrom(docs, s"$p/ds")
      val labels0 = spark.read.parquet(s"$p/ds/labels").count()
      graft.dedup.DedupState.appendDedupState(spark, s"$p/ds", docs,
        docs.limit(0), 1L)
      assert(spark.read.parquet(s"$p/ds/labels").count() == labels0,
        "an empty dedup append must preserve full label coverage")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(p))
    }
  }
}
