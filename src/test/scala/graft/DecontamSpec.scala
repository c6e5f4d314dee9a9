package graft

import org.apache.spark.sql.functions._

/** Driver-side model check for decontam_ngram (the oracle gate covers the
  * DuckDB mirror; this pins the semantics to an independent Scala model).
  */
class DecontamSpec extends SparkSpec {

  private def grams(text: String, n: Int): Set[String] = {
    val w = text.split(" ").filter(_.nonEmpty)
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  test("contaminated docs are exactly those sharing an n-gram with the benchmark slice") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        text.Sampling.hashBucket(col("text")).as("hb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bench = docs.filter(_._3 < text.Decontam.BENCH_CUT)
    val train = docs.filter(_._3 >= text.Decontam.BENCH_CUT)
    assert(bench.nonEmpty && train.nonEmpty, "both slices populated")
    val benchGrams = bench.flatMap(d => grams(d._2, text.Decontam.N)).toSet

    val want = train.map { case (id, t, _) =>
      id -> (grams(t, text.Decontam.N) & benchGrams).size.toLong
    }.toMap
    val got = SparkEntry.queries("decontam_ngram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet == want.keySet, "exactly the train slice")
    got.foreach { case (id, hits, cont) =>
      assert(hits == want(id), s"doc $id hit count")
      assert(cont == (hits > 0))
    }
    assert(got.exists(_._3), "corpus has at least one contaminated doc")
  }
}
