package graft

/** Cross-checks between the dedup pipelines (the SQL-expressible ones are
  * additionally oracle-gated by the driver).
  */
class DedupSpec extends SparkSpec {

  private def pairSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactJaccard = pairSet("dedup_ngram_jaccard")

  test("planted near-duplicates exist in the corpus") {
    assert(exactJaccard.nonEmpty)
  }

  test("minhash LSH has full recall vs exact jaccard at this scale") {
    assert(pairSet("dedup_minhash_lsh") == exactJaccard)
  }

  test("simhash recovers most jaccard near-dups at hamming<=3") {
    val sim = pairSet("dedup_simhash")
    val recall = (sim & exactJaccard).size.toDouble / exactJaccard.size
    info(s"simhash recall = $recall, extra pairs = ${(sim -- exactJaccard).size}")
    assert(recall >= 0.5)
    // precision sanity: hamming-close pairs shouldn't explode
    assert(sim.size <= exactJaccard.size * 3)
  }

  test("embedding LSH dedup has full recall vs the blocked exact join") {
    val exact = pairSet("dedup_embedding")
    assert(exact.nonEmpty)
    assert(pairSet("dedup_embedding_lsh") == exact)
  }

  test("df-capped jaccard bounds candidates with recall unchanged at TAU") {
    import org.apache.spark.sql.functions._
    val shingleTable = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        dedup.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .localCheckpoint()
    def pairs(cap: Option[Int]) =
      dedup.Dedup.jaccardPairs(shingleTable, dedup.Dedup.TAU, cap)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    assert(uncapped == exactJaccard, "fixture matches the gated query")
    assert(pairs(Some(dedup.Dedup.DEFAULT_DF_CAP)) == uncapped,
      "the shipped default cap loses nothing vs the uncapped plan")
    assert(pairs(Some(50)) == uncapped,
      "cap=50 keeps every TAU pair on this corpus (recall unchanged)")
    // a cap BELOW the max df forces the viral-bracket verify branch
    // (n_viral > 0): the full-array verify must recover the exact pairs
    assert(pairs(Some(5)) == uncapped,
      "tight cap: bracket + verify still yields the exact TAU pairs")
    // candidate mass shrinks monotonically as the cap tightens
    val candLoose = dedup.Dedup.jaccardCandidates(shingleTable, 50).count()
    val candTight = dedup.Dedup.jaccardCandidates(shingleTable, 5).count()
    info(s"candidates: cap=50 → $candLoose, cap=5 → $candTight")
    assert(candTight <= candLoose)
    assert(candLoose >= uncapped.size.toLong,
      "candidates must cover every verified pair")
  }

  test("exact dedup marks nothing in a duplicate-free corpus") {
    val d = SparkEntry.queries("dedup_exact")(spark, sfDir)
    assert(d.filter("is_dup").count() == 0)
  }

  test("connected components match a driver-side union-find fixpoint") {
    import org.apache.spark.sql.functions._
    // brute-force union-find over the collected TAU pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exactJaccard.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (exactJaccard.flatMap(p => Seq(p._1, p._2)))
      .map(id => id -> find(id)).toMap
    val got = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint lands on the union-find root
    want.foreach { case (id, root) => assert(got(id) == root) }
    // everything else is a singleton cluster of itself
    got.foreach { case (id, cid) =>
      if (!want.contains(id)) assert(cid == id)
    }
    // chains converge: a synthetic 1-2-3-4-5 path collapses to min=1
    val chain = spark.createDataFrame(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 6L)))
      .toDF("u", "v").repartition(4)
    val labels = dedup.Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(labels(_) == 1L))
    assert(labels(6L) == 6L && labels(7L) == 6L)
  }

  test("substringSpans finds cross-doc runs, within-doc repeats, and " +
      "merges overlapping grams into maximal spans") {
    import org.apache.spark.sql.functions._
    def ws(p: String, from: Int, to: Int) =
      (from to to).map(i => s"$p$i").mkString(" ")
    val run = ws("x", 1, 6) // the 6-token shared run
    val docs = spark.createDataFrame(Seq(
        // docs 1,2 share exactly one 6-token run, at positions 11 and 6
        (1L, ws("a", 1, 10) + " " + run + " " + ws("b", 1, 4)),
        (2L, ws("c", 1, 5) + " " + run + " " + ws("d", 1, 8)),
        // doc 3 repeats a 6-token run WITHIN itself, separated by one
        // token: two maximal spans of 6, no merge (gap of 1 at pos 7)
        (3L, ws("e", 1, 6) + " gap1 " + ws("e", 1, 6)),
        // doc 4 has no duplicated run
        (4L, ws("f", 1, 12)),
        // docs 5,6 are identical 12-token docs: 7 overlapping duplicated
        // grams merge into ONE maximal 12-token span
        (5L, ws("g", 1, 12)),
        (6L, ws("g", 1, 12))))
      .toDF("doc_id", "text")
    val got = dedup.Dedup.substringSpans(docs, 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((1L, 6L)) && got(2L) == ((1L, 6L)),
      "one 6-token span each for the shared run")
    assert(got(3L) == ((2L, 12L)),
      "within-doc repeat: two spans, not merged across the 1-token gap")
    assert(!got.contains(4L), "no duplicated run -> no row")
    assert(got(5L) == ((1L, 12L)) && got(6L) == ((1L, 12L)),
      "overlapping grams coalesce into one maximal span")
  }

  test("dedup_cross flags only new-vs-base near-dups, never " +
      "new-vs-new, and reports the min base match") {
    import org.apache.spark.sql.functions._
    val body = (1 to 30).map(i => s"qqw$i").mkString(" ")
    val other = (31 to 60).map(i => s"qqw$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cross").toString
    // src0/src1 are the NEW slice, src9 is base. Docs 1,2 (new) and
    // 10,11 (base) share one text; doc 3 (new) matches nothing in base
    // even though it duplicates NEW doc 1 — must stay un-flagged.
    spark.createDataFrame(Seq(
        (1L, body, "en", "src0", 1L),
        (2L, body, "en", "src1", 1L),
        (3L, body, "en", "src0", 1L),
        (4L, other, "en", "src1", 1L),
        (10L, body, "en", "src9", 1L),
        (11L, body, "en", "src9", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("dedup_cross")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "one row per NEW doc only")
    assert(got(1L) == ((true, Some(10L))), "min base id wins")
    assert(got(2L) == ((true, Some(10L))))
    assert(got(3L) == ((true, Some(10L))),
      "new-new dup also matching base is flagged via base")
    assert(got(4L) == ((false, None)), "no base match -> not flagged")
  }

  test("containment covers every planted near-dup both ways; a strict " +
      "sub-document flags ONE-way even at jaccard far below TAU") {
    val cont = SparkEntry.queries("dedup_containment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // containment ≥ jaccard, so J ≥ 0.9 pairs must flag BOTH ways;
    // lower-J near-dups (TAU=0.6) may legitimately fall under 0.9
    val strong = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .collect().filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty)
    for ((a, b) <- strong) {
      assert(cont.contains((a, b)) && cont.contains((b, a)),
        s"J>=0.9 near-dup ($a,$b) must flag in both orientations")
    }
    cont.values.foreach(v =>
      assert(v >= dedup.Dedup.CONT_MICRO && v <= 1000000L))
    // constructed asymmetric case: doc 1 is a strict prefix of doc 2,
    // whose long unique tail pushes jaccard well below TAU — exactly
    // the sub-document overlap jaccard-based dedup cannot see
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta " +
          (1 to 40).map(i => s"tail$i").mkString(" ")),
        (3L, "unrelated tokens sharing nothing with either document")))
      .toDF("doc_id", "text")
    val st = docs.select(col("doc_id"),
        dedup.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val rows = dedup.Dedup.containmentPairs(st, dedup.Dedup.CONT_MICRO)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L, 1000000L)),
      "prefix doc contained fully in the long doc, never the reverse, " +
        "and the unrelated doc pairs with nothing")
  }

  test("keep_best keeps exactly one member per cluster — the longest, " +
      "doc_id tie-broken — and agrees with dedup_clusters' assignment") {
    val kb = SparkEntry.queries("dedup_keep_best")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(kb.length == kb.map(_._1).distinct.length)
    kb.groupBy(_._2).foreach { case (cid, rows) =>
      val keeps = rows.filter(_._4)
      assert(keeps.length == 1, s"cluster $cid must keep exactly one")
      val best = rows.minBy(t => (-t._3, t._1))
      assert(keeps.head._1 == best._1,
        s"cluster $cid keeper must be the longest member (min-id ties)")
    }
    assert(kb.exists(t => !t._4), "planted dup clusters must drop members")
    val cl = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kb.foreach { case (id, cid, _, _) =>
      assert(cl(id) == cid, s"doc $id cluster differs from dedup_clusters")
    }
  }

  test("soft-dedup weights: floor millionths of 1/cluster_size, sizes " +
      "agree with dedup_clusters, cluster mass recovers ~1e6") {
    val rows = SparkEntry.queries("dedup_weights")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val clSizes = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(1)).groupBy(identity)
      .map { case (c, xs) => c -> xs.length.toLong }
    rows.foreach { case (id, cid, size, w) =>
      assert(size == clSizes(cid), s"doc $id cluster size mismatch")
      assert(w == 1000000L / size, s"doc $id weight not floor(1e6/n)")
    }
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val mass = members.map(_._4).sum
      val n = members.length
      assert(n.toLong == members.head._3)
      assert(mass <= 1000000L && mass > 1000000L - n,
        s"cluster $cid mass $mass outside (1e6-n, 1e6]")
    }
    assert(rows.exists(_._3 > 1), "planted dup clusters must downweight")
  }

  test("simhash drops token-less docs instead of pairing them at zero") {
    import org.apache.spark.sql.functions._
    // the oracle's unnest produces no tok rows for empty docs, so they
    // vanish there; the Spark side must drop them too, not sign them 0
    val tmp = java.nio.file.Files.createTempDirectory("graft_simhash").toString
    spark.createDataFrame(Seq(
        (1L, ""), (2L, "   "),
        (3L, "the exact same sentence of text"),
        (4L, "the exact same sentence of text")))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("dedup_simhash")(spark, tmp)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 4L)),
      "only the identical non-empty docs may pair; empty docs never")
  }

  test("dedup_cross_bloom == the no-bloom exact join on the real corpus; " +
      "constructed exact cross-dups are found, whitespace-normalized") {
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // real corpus: the bloom-prefiltered plan must be bit-equal to the
    // plain exact cross join (no false negatives; verify kills the fps)
    val got = rows(SparkEntry.queries("dedup_cross_bloom")(spark, sfDir))
    val f = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source").isin("src0", "src1").as("is_new"),
        graft.text.TextOps.normalizedMd5(col("text")).as("fp"))
    val direct = rows(f.filter(col("is_new")).as("n")
      .join(f.filter(!col("is_new")).as("b"),
        col("n.fp") === col("b.fp"), "left")
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("dup_of"))
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"))
      .orderBy("doc_id"))
    assert(got == direct)
    // constructed slices: exact dup (one with whitespace noise — the
    // normalization contract), and a non-dup that must pass through
    val tmp = java.nio.file.Files.createTempDirectory("graft_xbloom")
      .toString
    spark.createDataFrame(Seq(
        (1L, "shared sentence one", "src5"),
        (2L, "another base doc", "src6"),
        (3L, "  shared   sentence one ", "src0"),
        (4L, "totally new content", "src1"),
        (5L, "another base doc", "src0")))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val small = rows(SparkEntry.queries("dedup_cross_bloom")(spark, tmp))
    assert(small == Seq((3L, true, 1L), (4L, false, -1L), (5L, true, 2L)))
  }

  test("canonicalUrl: adversarial forms normalize per the step contract") {
    def c(u: String): String = graft.functions.TextKernels
      .canonicalUrl(org.apache.spark.unsafe.types.UTF8String.fromString(u))
      .toString
    // scheme+host case-fold, www strip, default-port strip, trailing
    // slashes, fragment drop, query sort — all equivalent spellings
    assert(Seq(
      "https://cdn.x.example.com/a/b?b=2&a=1",
      "HTTPS://WWW.Cdn.X.Example.COM:443/a/b/?b=2&a=1#frag",
      "https://cdn.x.example.com/a/b///?b=2&a=1")
      .map(c).distinct == Seq("https://cdn.x.example.com/a/b?a=1&b=2"))
    assert(c("http://Host.org:80/p") == "http://host.org/p")
    // a NON-default port is meaningful and must survive
    assert(c("http://host.org:443/p") == "http://host.org:443/p")
    assert(c("https://host.org:80/p") == "https://host.org:80/p")
    assert(c("https://host.org:8443/p") == "https://host.org:8443/p")
    // path-less / query-only / empty-query shapes
    assert(c("https://h.org") == "https://h.org")
    assert(c("https://h.org/") == "https://h.org")
    assert(c("https://h.org?z=1&a=2") == "https://h.org?a=2&z=1")
    assert(c("https://h.org/p?") == "https://h.org/p")
    assert(c("https://h.org#only-frag") == "https://h.org")
    // case is preserved where it matters: path and query values
    assert(c("https://h.org/CaseSensitive?Key=Val") ==
      "https://h.org/CaseSensitive?Key=Val")
    // no scheme -> opaque passthrough (fragment still stripped)
    assert(c("not a url") == "not a url")
    assert(c("relative/path#f") == "relative/path")
    // www is an authority prefix, not a path substring
    assert(c("https://h.org/www.keep") == "https://h.org/www.keep")
  }

  test("dedup_url: each 4-spelling group collapses to 2 canonical " +
      "groups of 2, keeper = min doc_id") {
    val rows = SparkEntry.queries("dedup_url")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "every doc lands in one group")
    // full groups (all 4 spellings present) have exactly 2 docs each:
    // {plain, cased+slash} and {www+port+reversed-query, frag+query}
    val full = rows.filter(_._3 == 2)
    assert(full.length >= (nDocs / 4 - 1) * 2,
      s"expected ~${nDocs / 4 * 2} two-doc canonical groups")
    full.foreach { case (url, keep, _) =>
      assert(url == url.toLowerCase.replace(":443", "")
        .replace("www.", ""), s"non-canonical url survived: $url")
      assert(keep % 4 == 0 || keep % 4 == 2,
        s"keeper must be the group's min doc_id spelling: $keep")
    }
    // with/without-query variants must NOT merge
    assert(full.count(_._1.contains("?a=1&b=2")) == full.length / 2)
  }

  test("substringScrub removes non-first duplicated runs, keeps the " +
      "global first occurrence, coalesces overlapping spans") {
    import spark.implicits._
    val docs = Seq(
      // doc 1 carries the run first — kept verbatim
      (1L, "u1 u2 d1 d2 d3 d4 d5 d6 u3 u4"),
      // doc 2 repeats the 6-token run mid-doc — run removed
      (2L, "v1 v2 v3 d1 d2 d3 d4 d5 d6 v4"),
      // doc 3: the run TWICE in one doc → overlapping covered spans
      // coalesce; both occurrences are non-first (doc 1 owns the min
      // key), so both vanish
      (3L, "d1 d2 d3 d4 d5 d6 w1 d1 d2 d3 d4 d5 d6"),
      // doc 4: unique text, untouched
      (4L, "x1 x2 x3 x4 x5 x6 x7"),
      // doc 5: NOTHING but a non-first duplicated run — scrubs to the
      // empty string but must still report (totality)
      (5L, "d1 d2 d3 d4 d5 d6")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.substringScrub(docs, 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, 10L, "u1 u2 d1 d2 d3 d4 d5 d6 u3 u4")))
    assert(out(2L) == ((10L, 4L, "v1 v2 v3 v4")))
    assert(out(3L) == ((13L, 1L, "w1")))
    assert(out(4L) == ((7L, 7L, "x1 x2 x3 x4 x5 x6 x7")))
    assert(out(5L) == ((6L, 0L, "")),
      "a fully-duplicated doc must report with an empty scrubbed text")
  }

  test("substringScrub fails fast when doc_id exceeds the packed-key " +
      "bound instead of silently wrapping the argmin key") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (1L << 43, "a b c d e f g")).toDF("doc_id", "text")
    val err = intercept[Exception] {
      graft.dedup.Dedup.substringScrub(docs, 6).collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("2^43") ||
        Option(err.getCause).exists(_.getMessage.contains("2^43"))),
      s"expected the packed-key bound error, got: ${err.getMessage}")
  }

  test("substringScrub accepts doc_ids past 2^31 (the sf1 replica " +
      "stride) now that the pack is 43/20") {
    import spark.implicits._
    val docs = Seq(
      (5000000000L, "a b c d e f g a b c d e f g"),
      (5000000001L, "h i j k l m n")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.substringScrub(docs, 6).collect()
    assert(out.length == 2)
  }
}
