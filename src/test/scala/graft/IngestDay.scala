package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed "one ingest day" receipt (VERDICT-r15 stretch): every
  * persisted-artifact lifecycle is gated ALONE (DedupStateSpec,
  * KnnGraphAppendSpec, TextIndexSpec); this main chains them into one
  * production-shaped timeline over the SAME corpus —
  *
  *   build(base) → append(slice 1) → append(slice 2) → compact →
  *   takedown → query
  *
  * across the dedup state, the kNN graph (frozen codebook), and the
  * text index TOGETHER, querying all three after every phase, and
  * closes with the bit-equality proof: each artifact must equal a
  * from-scratch rebuild over the surviving corpus. Writes the
  * INGESTDAY receipt JSON (phase timings, per-phase query counts,
  * equality booleans) and exits nonzero on any violation.
  *
  * Run: sbt "Test/runMain graft.IngestDay [sfDir] [outJson]"
  */
object IngestDay {
  private def r3(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "INGESTDAY_r16.json"
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("ingest-day")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val embs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // day plan: base corpus + two disjoint ingest slices, then a
    // takedown sweep that crosses base AND slice-1 partitions
    val dm = col("doc_id") % 10
    val em = col("vec_id") % 10
    val (dBase, d1, d2) = (docs.filter(dm < 7),
      docs.filter(dm === 7), docs.filter(dm > 7))
    val (eBase, e1, e2) = (embs.filter(em < 7),
      embs.filter(em === 7), embs.filter(em > 7))
    val dGoneCond = col("doc_id") % 37 === 3
    val eGoneCond = col("vec_id") % 37 === 3

    val root = java.nio.file.Files.createTempDirectory("graft-ingestday")
    val (dedupPath, graphPath, textPath) =
      (s"$root/dedup", s"$root/graph", s"$root/text")

    val phases = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Map[String, Long])]
    def phase(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      val q = queryAll()
      phases += ((name, secs, q))
      System.err.println(f"[ingest-day] $name%-22s ${secs}%7.2f s  " +
        q.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    // the same three reads a production consumer runs all day — every
    // phase must leave all three artifacts queryable
    def queryAll(): Map[String, Long] = Map(
      "dedup_clusters" -> spark.read.parquet(s"$dedupPath/labels")
        .filter(col("cluster_size") > 1).count(),
      "graph_search" -> graft.sim.Knn.graphSearchAt(spark, graphPath,
        embs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv")),
        graft.sim.Knn.BEAM_SEEDS, graft.sim.Knn.BEAM_W,
        graft.sim.Knn.BEAM_HOPS)._1.count(),
      "text_and" -> graft.text.TextIndex.queryTextIndex(spark, textPath,
        graft.text.TextIndex.QUERY_TERMS).count(),
      "text_ranked" -> graft.text.TextIndex.queryTextIndexRanked(spark,
        textPath, graft.text.TextIndex.RANKED_TERMS,
        graft.text.TextIndex.RANKED_K).count())

    try {
      phase("build(base)") {
        graft.dedup.DedupState.buildDedupStateFrom(dBase, dedupPath)
        graft.sim.Knn.buildKnnGraphIndexFrom(eBase, graphPath)
        // the text index ingests through its STREAMING sink from batch
        // 0 (the sink refuses to stream into a buildTextIndex layout),
        // finalize = the dictionary pass
        graft.text.TextIndex.textIndexSink(textPath)(dBase, 0L)
        graft.text.TextIndex.finalizeTextIndex(spark, textPath)
      }
      phase("append(slice 1)") {
        graft.dedup.DedupState.appendDedupState(spark, dedupPath,
          dBase, d1, ingestId = 1L)
        graft.sim.Knn.appendKnnGraph(spark, graphPath, e1, 1L)
        graft.text.TextIndex.textIndexSink(textPath)(d1, 1L)
        graft.text.TextIndex.finalizeTextIndex(spark, textPath)
      }
      phase("append(slice 2)") {
        graft.dedup.DedupState.appendDedupState(spark, dedupPath,
          dBase.unionByName(d1), d2, ingestId = 2L)
        graft.sim.Knn.appendKnnGraph(spark, graphPath, e2, 2L)
        graft.text.TextIndex.textIndexSink(textPath)(d2, 2L)
        graft.text.TextIndex.finalizeTextIndex(spark, textPath)
      }
      phase("compact") {
        graft.dedup.DedupState.compactDedupState(spark, dedupPath)
        graft.sim.Knn.compactKnnGraphIndex(spark, graphPath)
      }
      phase("takedown") {
        graft.dedup.DedupState.removeDocs(spark, dedupPath,
          docs.filter(dGoneCond).select("doc_id"))
        graft.sim.Knn.removeFromKnnGraph(spark, graphPath,
          embs.filter(eGoneCond).select("vec_id"))
        graft.text.TextIndex.removeDocs(spark, textPath,
          docs.filter(dGoneCond).select("doc_id"))
      }
      phase("compact(post-takedown)") {
        graft.text.TextIndex.compactTextIndex(spark, textPath)
      }

      // ---- the day's proof: each artifact == a from-scratch rebuild
      // over the surviving corpus (frozen codebook for the graph)
      val dLive = docs.filter(!dGoneCond)
      val eLive = embs.filter(!eGoneCond)

      val freshDedup = s"$root/dedup-fresh"
      graft.dedup.DedupState.buildDedupStateFrom(dLive, freshDedup)
      def labels(p: String) = spark.read.parquet(s"$p/labels")
        .select("doc_id", "cluster_id", "cluster_size").collect().toSet
      val dedupEq = labels(dedupPath) == labels(freshDedup)

      val cents = spark.read.parquet(s"$graphPath/cents")
      val edgesEq = spark.read.parquet(s"$graphPath/edges").collect().toSet ==
        graft.sim.Knn.knnGraphFrom(eLive, cents).collect().toSet
      // the walk reads the DERIVED layout (sym/medoids/celladj) — prove
      // the maintained layout answers searches like a fresh build's
      val freshGraph = s"$root/graph-fresh"
      graft.sim.Knn.buildKnnGraphIndexWith(eLive, cents, freshGraph)
      def walk(p: String) = graft.sim.Knn.graphSearchAt(spark, p,
        embs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv")),
        graft.sim.Knn.BEAM_SEEDS, graft.sim.Knn.BEAM_W,
        graft.sim.Knn.BEAM_HOPS)._1.collect().toSeq
      val walkEq = walk(graphPath) == walk(freshGraph)

      val freshText = s"$root/text-fresh"
      graft.text.TextIndex.buildTextIndex(dLive, freshText)
      def tq(p: String) = (
        graft.text.TextIndex.queryTextIndex(spark, p,
          graft.text.TextIndex.QUERY_TERMS).collect().toSet,
        graft.text.TextIndex.queryTextIndexRanked(spark, p,
          graft.text.TextIndex.RANKED_TERMS,
          graft.text.TextIndex.RANKED_K).collect().toSeq)
      val textEq = tq(textPath) == tq(freshText)

      val eq = Map("dedup_labels" -> dedupEq, "graph_edges" -> edgesEq,
        "graph_search_walk" -> walkEq, "text_queries" -> textEq)
      val phaseJson = phases.map { case (n, s, q) =>
        s"""{"phase":"$n","secs":${r3(s)},""" +
          q.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
      }.mkString("[", ",", "]")
      val json = s"""{"metric":"ingest_day","sf":"$sfDir",
        |"timeline":"build -> append x2 -> compact -> takedown -> compact",
        |"artifacts":["dedup_state","knn_graph","text_index"],
        |"phases":$phaseJson,
        |"rebuild_equality":{${eq.map { case (k, v) =>
             s""""$k":$v""" }.mkString(",")}},
        |"all_equal":${eq.values.forall(identity)}}"""
        .stripMargin.replace("\n", "")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        json + "\n")
      println(json)
      require(eq.values.forall(identity),
        s"ingest-day rebuild equality violated: $eq")
      println("INGEST_DAY_OK")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(root.toFile)
      spark.stop()
    }
  }
}
