package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

/** text_bpe_train vs an independent driver-side BPE (the textbook
  * sequential algorithm — no shared code with the distributed
  * double-replace pipeline), plus the structural invariants of a merge
  * table (text_bpe_train itself is oracle-gated by the driver).
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE: explicit symbol vectors, naive overlapping pair
    * counts, (count DESC, x, y) winner, sequential left-to-right merge.
    */
  private def model(dict: Seq[(String, Long)],
      rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var seqs = dict.map { case (w, n) =>
      (w.toCharArray.map(_.toString).toVector, n)
    }
    val out = mutable.Buffer.empty[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, n) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += n
      if (counts.nonEmpty) {
        val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) =>
          (-n, a, b)
        }
        out += ((r.toLong, x, y, x + y, c))
        seqs = seqs.map { case (s, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == x && s(i + 1) == y) {
              b += (x + y); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), n)
        }
      }
    }
    out.toSeq
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq

  test("text_bpe_train == sequential reference BPE on the real corpus; " +
      "winner counts never increase") {
    val got = rows(SparkEntry.queries("text_bpe_train")(spark, sfDir))
    val dict = Tables(spark, sfDir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == model(dict, graft.text.Bpe.ROUNDS))
    // merging (x,y) can only create pairs no more frequent than the
    // round's winner, so the winning count is non-increasing in rank
    assert(got.sliding(2).forall { case Seq(a, b) => b._5 <= a._5
      case _ => true })
    assert(got.forall { case (_, x, y, m, c) => m == x + y && c >= 1 })
  }

  /** Apply the reference model's merges to one word, sequentially. */
  private def applyModel(word: String,
      merges: Seq[(Long, String, String, String, Long)]): Int = {
    var s = word.toCharArray.map(_.toString).toVector
    for ((_, x, y, _, _) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == x && s(i + 1) == y) {
          b += (x + y); i += 2
        } else { b += s(i); i += 1 }
      }
      s = b.result()
    }
    s.length
  }

  test("text_bpe_apply == applying the reference merges word by word") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dict = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, a) => (w, a.length.toLong) }.toSeq
    val merges = model(dict, graft.text.Bpe.ROUNDS)
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None else {
        val nBpe = ws.map(w => applyModel(w, merges).toLong).sum
        Some((id, ws.length.toLong, nBpe, nBpe * 1000 / ws.length))
      }
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("text_bpe_apply")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // fertility sanity: BPE can only split words, never merge across
    // them, so n_ws <= n_bpe <= total chars
    assert(got.forall { case (_, ws, bpe, _) => ws <= bpe })
  }

  test("constructed corpus: overlapping runs merge left-to-right, " +
      "merges chain across rounds, rounds stop when no pairs remain") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    spark.createDataFrame(Seq(
        (1L, "ab ab ab aaaa"), (2L, "abc ab")))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = rows(SparkEntry.queries("text_bpe_train")(spark, tmp))
    val dict = Seq("ab" -> 4L, "aaaa" -> 1L, "abc" -> 1L)
    assert(got == model(dict, graft.text.Bpe.ROUNDS))
    // round 1 winner must be (a,b) c=5 (4 in 'ab' + 1 in 'abc'), and
    // 'aaaa' must count (a,a) overlapping as 3
    assert(got.head == ((1L, "a", "b", "ab", 5L)))
    // the table ends when the dictionary is fully merged — strictly
    // fewer rows than ROUNDS on this tiny corpus, same in both models
    assert(got.size < graft.text.Bpe.ROUNDS)
  }
}
