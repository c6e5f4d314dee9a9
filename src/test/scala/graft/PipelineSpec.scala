package graft

import org.apache.spark.sql.functions._

/** The two near-dup policies must differ exactly where VERDICT r3 said
  * the pair policy over-keeps: a CHAINED family a~c, b~c, a≁b is one
  * duplication family, but dropping only pair b-sides keeps both a and
  * b; the clustered policy keeps exactly one doc per component.
  */
class PipelineSpec extends SparkSpec {

  test("clustered policy keeps one doc per chained-dup family; " +
      "pair policy over-keeps") {
    import spark.implicits._
    // 3-shingle sets: c = w1..w30 (28 shingles), a = w1..w22 (20),
    // b = w9..w30 (20). j(a,c) = j(b,c) = 20/28 ≈ 0.71 ≥ τ=0.6;
    // j(a,b) = 12/28 ≈ 0.43 < τ — a chained family {a,b,c}, no a–b edge.
    def words(from: Int, to: Int): String =
      (from to to).map(i => s"zqword$i").mkString(" ")
    val docs = Seq(
      (1L, "en", words(1, 22)),
      (2L, "en", words(9, 30)),
      (3L, "en", words(1, 30)))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def kept(q: String): Long =
      SparkEntry.queries(q)(spark, dir)
        .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(kept("pipeline_prepare") == 2L,
      "pair policy keeps both chain endpoints (the over-keep)")
    assert(kept("pipeline_prepare_clustered") == 1L,
      "one component -> exactly one kept doc")
  }
}
