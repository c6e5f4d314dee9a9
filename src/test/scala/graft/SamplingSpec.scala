package graft

import org.apache.spark.sql.functions._

/** Driver-side model checks for the hash samplers (both oracle-gated). */
class SamplingSpec extends SparkSpec {

  private def md5Bucket(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
  }

  test("stratified sampling == integer-threshold model; min source fully kept") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mn = counts.values.min
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(r => md5Bucket(r._2) * counts(src) < mn * 65536L).toLong)
    }
    val got = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // the smallest source runs at rate 1.0: every doc clears hb < 65536
    val minSrc = counts.minBy { case (s, n) => (n, s) }._1
    assert(got(minSrc)._1 == got(minSrc)._2)
    // every source is downsampled toward the min (never upsampled)
    got.foreach { case (_, (n, k)) => assert(k <= n) }
  }

  test("stratified samples nest: lower rate selects a subset") {
    // raising n (lowering the rate) can only REMOVE docs: the accept set
    // {hb : hb*n < mn*65536} shrinks monotonically in n
    val docs = Tables(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val mn = 10L
    val keepAt = (n: Long) => docs.filter(t => md5Bucket(t) * n < mn * 65536L)
    assert(keepAt(40L).toSet.subsetOf(keepAt(20L).toSet))
  }

  test("corpus_mix: binding lang fully kept, others downsampled toward " +
      "the target token mixture") {
    val rows = SparkEntry.queries("corpus_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // binding lang = exact argmin of avail/weight: rate 1.0, so every
    // one of its docs clears hb < 65536
    val binding = rows.minBy { case (l, w, _, a, _, _) =>
      (a.toDouble / w, l) }
    assert(binding._3 == binding._5,
      s"binding lang ${binding._1} must be fully kept")
    // never upsampled; achieved token share tracks the target weight
    // (hash sampling is unbiased; ±0.05 absolute is generous at sf0.01)
    val totalSampled = rows.map(_._6).sum.toDouble
    val totalW = rows.map(_._2).sum.toDouble
    rows.foreach { case (l, w, n, _, k, st) =>
      assert(k <= n)
      val achieved = st / totalSampled
      val target = w / totalW
      assert(math.abs(achieved - target) < 0.05,
        s"$l achieved $achieved vs target $target")
    }
  }

  test("quality-weighted sampling == score/5 hash model; top score " +
      "fully kept; keep monotone in score") {
    // independent score: recompute q from text_quality's own gated
    // output (5 - n_failed), hash from the raw text
    val failed = SparkEntry.queries("text_quality")(spark, sfDir)
      .select("doc_id", "n_failed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (id, text) =>
      val q = failed.get(id).map(5L - _).getOrElse(0L)
      (q, md5Bucket(text) * 5L < q * 65536L)
    }
    val want = scored.groupBy(_._1).view.mapValues(rows =>
      (rows.length.toLong, rows.count(_._2).toLong)).toMap
    val got = SparkEntry.queries("sample_quality_weighted")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // p = 5/5 keeps everything; keep RATE is ~q/5 within binomial noise
    got.get(5L).foreach { case (n, k) => assert(n == k) }
    got.foreach { case (q, (n, k)) =>
      val p = q / 5.0
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(k - n * p) <= 3 * sd + 1,
        s"score $q: kept $k of $n, expected ~${n * p}")
    }
  }

  test("sample_budget: weights match sample_temperature, allocation " +
      "sums under budget, epoch rule exact and non-trivial") {
    val temp = SparkEntry.queries("sample_temperature")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val rows = SparkEntry.queries("sample_budget")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == temp.keySet)
    rows.foreach { case (lang, tokens, q, alloc, epochs) =>
      assert(q == temp(lang), s"$lang weight differs from temperature op")
      assert(alloc == 10000000L * q / 1000000L, s"$lang allocation rule")
      assert(epochs == alloc * 1000L / tokens, s"$lang epoch rule")
    }
    assert(rows.map(_._4).sum <= 10000000L, "floor allocs stay in budget")
    assert(rows.exists(_._5 != 1000L),
      "temperature mixing must up- or down-sample some language")
  }
}
