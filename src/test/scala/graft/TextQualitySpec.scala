package graft

import org.apache.spark.sql.functions._

/** Driver-side model for the Gopher-rule composite filter. */
class TextQualitySpec extends SparkSpec {

  test("text_quality flags == independent per-doc rule model") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = SparkEntry.queries("text_quality")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getLong(7), r.getBoolean(8))).toMap
    var kept = 0
    docs.foreach { case (id, text) =>
      val w = text.split(" ").filter(_.nonEmpty)
      if (w.nonEmpty) {
        val rLen = w.length >= 20 && w.length <= 1000
        val rWl = { val a = w.map(_.length).sum.toDouble / w.length
          a >= 3.0 && a <= 10.0 }
        val rStop = w.count(t => t == "the" || t == "a") >= 1
        val rUniq = w.distinct.length * 1.0 / w.length >= 0.32
        val rRep2 = {
          val m2 = if (w.length < 2) 0
            else w.sliding(2).map(_.mkString(" ")).toSeq
              .groupBy(identity).values.map(_.size).max
          m2 * 2.0 / w.length <= 0.2
        }
        val rules = Seq(rLen, rWl, rStop, rUniq, rRep2)
        val (a, b, c, d, e, nf, keep) = got(id)
        assert((a, b, c, d, e) == (rLen, rWl, rStop, rUniq, rRep2),
          s"doc $id rules")
        assert(nf == rules.count(!_) && keep == rules.forall(identity))
        if (keep) kept += 1
      } else assert(!got.contains(id), "zero-token docs are dropped")
    }
    // the filter discriminates: keeps most docs, drops a real minority
    assert(kept > docs.length / 2 && kept < docs.length)
  }

  test("text_lm_score: MLE conditionals sum to 1 per context, floor " +
      "millionths, null score for bigram-less docs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // grams: "a b" ×2 (docs 1,2), "a c" ×1 (doc 3) ⇒ c(a·)=3,
    // p(b|a)=2/3 → floor 666666, p(c|a)=1/3 → floor 333333
    spark.createDataFrame(Seq(
        (1L, "a b", "en", "s", 3L), (2L, "a b", "en", "s", 3L),
        (3L, "a c", "en", "s", 3L), (4L, "solo", "en", "s", 4L),
        (5L, "", "en", "s", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("text_lm_score")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got(1L) == ((1L, Some(0.666666))) &&
      got(2L) == ((1L, Some(0.666666))))
    assert(got(3L) == ((1L, Some(0.333333))))
    assert(got(4L) == ((0L, None)) && got(5L) == ((0L, None)),
      "docs without bigrams report n=0 and null score")
  }

  test("text_ngram_lm: valid conditional model (c2 <= c1, floor " +
      "millionths bounded, contexts consistent)") {
    val rows = SparkEntry.queries("text_ngram_lm")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 300)
    rows.foreach { case (gram, c1, c2, p) =>
      assert(gram.split(" ").length == 2)
      assert(c2 >= 1 && c2 <= c1, s"$gram: c2=$c2 > c1=$c1")
      assert(p == c2 * 1000000L / c1 && p <= 1000000L)
    }
    // every gram sharing a context reports the same c1
    rows.groupBy(_._1.split(" ").head).foreach { case (w1, g) =>
      assert(g.map(_._2).distinct.length == 1,
        s"context $w1 reports inconsistent c1")
    }
  }

  test("text_oov: rate is n_oov/n_tokens; vocab covers the top tokens") {
    val rows = SparkEntry.queries("text_oov")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, oov, rate) =>
      assert(oov >= 0 && oov <= n)
      if (n > 0) assert(rate == oov.toDouble / n, s"doc $id rate mismatch")
    }
    // an 8-word vocab over a 31-word corpus must leave real OOV mass,
    // and the top tokens must keep the mean rate well below 1
    val mean = rows.map(_._4).sum / rows.length
    assert(mean > 0.0 && mean < 0.9, s"mean OOV rate $mean")
  }

  test("text_badwords: counts == a driver-side token scan; flag is " +
      "exactly the 5% integer rule and splits the corpus") {
    val lex = text.TextOps.BADWORDS.toSet
    val raw = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        r.getLong(0) -> (toks.length.toLong, toks.count(lex).toLong)
      }.toMap
    val rows = SparkEntry.queries("text_badwords")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == raw.size)
    rows.foreach { case (id, n, f, flagged) =>
      assert((n, f) == raw(id), s"doc $id count mismatch")
      assert(flagged == (n > 0 && f * 20 >= n), s"doc $id flag rule")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "the 5% threshold must separate docs at this lexicon density")
  }

  test("text_keywords == a driver-side lift model: top-3 per source by " +
      "integer purity ratio") {
    val toks = Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
      .collect().flatMap(r => r.getString(1).split(" ")
        .filter(_.nonEmpty).map(r.getString(0) -> _))
    val bySrc = toks.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val corpus = toks.groupBy(_._2).map { case (t, v) =>
      t -> v.length.toLong }
    val expected = bySrc.toSeq
      .map { case ((src, tok), tf) =>
        (src, tok, tf, corpus(tok), tf * 1000000L / corpus(tok)) }
      .groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._5, t._2)).take(3).zipWithIndex
          .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, i + 1L) }
      }.toSet
    val got = SparkEntry.queries("text_keywords")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("text_ppl_bucket: distributed ntile == naive global sort; " +
      "head outranks tail") {
    val got = SparkEntry.queries("text_ppl_bucket")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = got.length
    // naive model: sort by (score DESC, doc_id), ntile split with the
    // first n mod 3 buckets one larger
    val sizes = Array.tabulate(3)(i => n / 3 + (if (i < n % 3) 1 else 0))
    val bounds = sizes.scanLeft(0)(_ + _).tail
    val expected = got.sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, s, _), i) =>
        (id, s, (bounds.indexWhere(i < _) + 1).toLong)
      }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // bucket sizes near-equal; every head score >= every tail score
    val byB = got.groupBy(_._3)
    assert(byB.values.map(_.length).max - byB.values.map(_.length).min <= 1)
    assert(byB(1L).map(_._2).min >= byB(3L).map(_._2).max)
  }
}
