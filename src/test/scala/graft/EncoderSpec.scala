package graft

import org.apache.spark.sql.functions.col

import graft.multimodal.{EmbedState, FakeClipEncoder, GramHistogramEncoder,
  MediaEncoder, MediaMeta, MediaRecord, Multimodal}

/** The pluggable [[graft.multimodal.MediaEncoder]] seam (VERDICT-r16
  * #7): the EmbedState layout must be encoder-AGNOSTIC in fact, not
  * just in Scaladoc — same schemas, same lifecycle equivalences under
  * a non-gram encoder — and the default path must stay bit-identical
  * to the legacy gramVectors tier so the gated oracles never move.
  */
class EncoderSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("GramHistogramEncoder path is bit-identical to legacy gramVectors") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val legacy = Multimodal.gramVectors(media)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    val enc = MediaEncoder.encoderVectors(media, GramHistogramEncoder)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    assert(legacy.nonEmpty && enc == legacy,
      "routing through the encoder seam must not move a single bit " +
        "of the gated gram-vector tier")
  }

  test("FakeClipEncoder has model-like geometry: near-dup payloads " +
      "cluster tight, unrelated payloads spread toward zero") {
    // deterministic "unrelated" payloads: distinct pseudo-random bytes
    val rnd = new scala.util.Random(7)
    val base = Array.fill(3)(Array.fill(512)(rnd.nextInt(256).toByte))
    val dup = base.map { p =>
      val q = p.clone(); q(100) = (q(100) + 1).toByte; q // 1-byte mutation
    }
    val vecs = FakeClipEncoder.encodeBatch((base ++ dup).toSeq)
    assert(vecs.forall(_.length == FakeClipEncoder.dim))
    assert(vecs.forall(v => math.abs(cosine(v, v) - 1.0) < 1e-9),
      "unit-norm output")
    val dupCos = (0 until 3).map(i => cosine(vecs(i), vecs(i + 3)))
    val bgCos = for (i <- 0 until 3; j <- 0 until 3 if i != j)
      yield cosine(vecs(i), vecs(j + 3))
    assert(dupCos.forall(_ > 0.95),
      s"near-dups must sit near 1, got $dupCos")
    assert(bgCos.forall(_ < 0.5),
      s"unrelated payloads must spread well below threshold, got $bgCos")
    assert(dupCos.min - bgCos.max > 0.45,
      "the cluster/background margin the gram histogram lacks")
  }

  test("EmbedState under FakeClipEncoder: same layout, append equals " +
      "from-scratch rebuild, takedown works — encoder-agnostic in fact") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val base = media.filter(col("mediaId") % 2 === 0)
    val slice = media.filter(col("mediaId") % 2 =!= 0)
    val incr = java.nio.file.Files.createTempDirectory("graft-enc-incr")
    val full = java.nio.file.Files.createTempDirectory("graft-enc-full")
    val gram = java.nio.file.Files.createTempDirectory("graft-enc-gram")
    try {
      EmbedState.buildEmbedStateFrom(media, full.toString, FakeClipEncoder)
      EmbedState.buildEmbedStateFrom(media, gram.toString)
      // layout parity: same table set, same schemas as the gram build
      for (t <- Seq("buckets", "vecs", "pairs")) {
        val a = spark.read.parquet(s"$full/$t").schema
        val b = spark.read.parquet(s"$gram/$t").schema
        assert(a == b, s"$t schema must be encoder-independent: $a vs $b")
      }
      EmbedState.buildEmbedStateFrom(base, incr.toString, FakeClipEncoder)
      EmbedState.appendEmbedState(spark, incr.toString, slice, 1L,
        FakeClipEncoder)
      def pairs(p: java.nio.file.Path) = spark.read.parquet(s"$p/pairs")
        .select("a_id", "b_id", "cosine").collect().toSet
      assert(pairs(full).nonEmpty,
        "the corpus's planted exact dups are cosine-1 under ANY " +
          "encoder — an empty pair table means the candidate tier broke")
      assert(pairs(incr) == pairs(full),
        "append under the fake-clip encoder must equal the " +
          "from-scratch union build")
      // materialize the victim id BEFORE the rewrite: removeMedia
      // deletes the files a lazy frame over vecs would re-read
      val gone = spark.read.parquet(s"$full/vecs")
        .select(col("doc_id")).orderBy("doc_id").limit(1)
        .collect()(0).getLong(0)
      import spark.implicits._
      EmbedState.removeMedia(spark, full.toString,
        Seq(gone).toDF("doc_id"))
      assert(!spark.read.parquet(s"$full/vecs").collect()
        .exists(_.getLong(0) == gone), "takedown must drop the vector")
    } finally { rm(incr.toFile); rm(full.toFile); rm(gram.toFile) }
  }

  test("encoder contract is enforced: wrong arity and wrong dim fail fast") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).limit(4)
    val badArity = new MediaEncoder {
      val name = "bad-arity"; val dim = 4
      def encodeBatch(ps: Seq[Array[Byte]]) =
        ps.take(ps.length - 1).map(_ => Array.fill(4)(1.0))
    }
    val e1 = intercept[org.apache.spark.SparkException] {
      MediaEncoder.encoderVectors(media, badArity).collect()
    }
    assert(e1.getMessage.contains("1:1") ||
      Option(e1.getCause).exists(_.getMessage.contains("1:1")))
    val badDim = new MediaEncoder {
      val name = "bad-dim"; val dim = 4
      def encodeBatch(ps: Seq[Array[Byte]]) =
        ps.map(_ => Array.fill(5)(1.0))
    }
    val e2 = intercept[org.apache.spark.SparkException] {
      MediaEncoder.encoderVectors(media, badDim).collect()
    }
    assert(e2.getMessage.contains("dim") ||
      Option(e2.getCause).exists(_.getMessage.contains("dim")))
  }
}
