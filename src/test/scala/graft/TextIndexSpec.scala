package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Persisted full-text index: build/query API, DPP-pruned reads,
  * build-once session caching (text_search itself is oracle-gated).
  */
class TextIndexSpec extends SparkSpec {

  test("text_search reads the postings with dynamic partition pruning " +
      "and reuses one session-cached build") {
    val d = SparkEntry.queries("text_search")(spark, sfDir)
    d.collect() // AQE finalizes the plan; triggers (at most one) build
    val afterFirst = graft.text.TextIndex.buildCount
    assert(afterFirst >= 1, "first query must have built the index")
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "term broadcast must prune pb partitions at the postings scan")
    SparkEntry.queries("text_search")(spark, sfDir).collect()
    assert(graft.text.TextIndex.buildCount == afterFirst,
      "second query must NOT rebuild the index")
  }

  test("buildTextIndex/queryTextIndex: caller path, overwrite-in-place, " +
      "AND semantics match a direct computation") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-text-idx").toFile
    try {
      val path = dir.getAbsolutePath + "/idx"
      graft.text.TextIndex.buildTextIndex(docs, path)
      graft.text.TextIndex.buildTextIndex(docs, path) // overwrite, no dupes
      assert(new java.io.File(path).listFiles().map(_.getName).toSet ==
        Set("postings", "terms"))
      val got = graft.text.TextIndex
        .queryTextIndex(spark, path, Seq("table", "sort", "table"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // independent model: docs whose token lists contain BOTH terms,
      // scored by the two terms' total occurrences
      val want = docs.select(col("doc_id"),
          graft.text.TextOps.tokens(col("text")).as("toks"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
        .filter { case (_, ts) => ts.contains("table") && ts.contains("sort") }
        .map { case (id, ts) =>
          id -> ts.count(t => t == "table" || t == "sort").toLong }
        .toMap
      assert(got == want)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
