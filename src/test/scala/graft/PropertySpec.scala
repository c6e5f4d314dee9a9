package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextKernels, Tokens, WordShingles}
import graft.plans.{AsofDirection, AsofJoin}

/** Property-based cross-checks: kernels vs composed references on
  * generated inputs, and the native asof merge vs an in-memory reference
  * model on random key/time data (duplicates, unmatched keys, nulls are
  * exercised by construction).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // words over a small alphabet (forces shingle collisions), plus unicode
  private val word: Gen[String] = Gen.oneOf(
    "a", "b", "ab", "the", "x1", "héllo", "东京", "zz")
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.listOfN(math.max(0, n - 1), Gen.oneOf(" ", "  ", "   "))
    lead <- Gen.oneOf("", " ", "  ")
    trail <- Gen.oneOf("", " ")
  } yield lead + (ws, sep :+ "").zipped.map(_ + _).mkString + trail

  /** Reference tokenizer: the exact semantics the kernels must keep. */
  private def refTokens(s: String): Seq[String] =
    s.split(" ", -1).toSeq.filter(_.nonEmpty)

  test("Tokens kernel == split-filter reference on generated text") {
    check(forAll(text) { s =>
      val got = TextKernels.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toSeq.map(_.toString)
      got == refTokens(s)
    })
  }

  test("shingles kernel == sliding-distinct reference on generated text") {
    check(forAll(text, Gen.choose(1, 4)) { (s, k) =>
      val got = TextKernels.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toSeq[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString)
      val toks = refTokens(s)
      val want =
        if (toks.length < k) Seq.empty
        else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
      got == want
    })
  }

  test("maxShingleCount kernel == groupBy-count reference") {
    check(forAll(text, Gen.choose(1, 3)) { (s, k) =>
      val got = TextKernels.maxShingleCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
      val toks = refTokens(s)
      val want =
        if (toks.length < k) 0
        else toks.sliding(k).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max
      got == want
    })
  }

  test("winnow rolling-deque min == naive window-min reference") {
    check(forAll(text, Gen.choose(1, 3), Gen.choose(1, 5)) { (s, k, w) =>
      val got = TextKernels.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        .toLongArray().toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      def h60(g: String): Long = {
        val d = md.digest(g.getBytes("UTF-8"))
        ((0 until 8).foldLeft(0L)((a, j) => (a << 8) | (d(j) & 0xffL))
          >>> 4)
      }
      val toks = refTokens(s)
      val grams = if (toks.length < k) Seq.empty
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      val hs = grams.map(h60)
      val want =
        if (hs.isEmpty) Seq.empty
        else if (hs.length < w) Seq(hs.min) // short doc = one window
        else hs.sliding(w).map(_.min).toSeq.distinct.sorted
      got == want
    })
  }

  test("simhash kernel == independent weighted-vote reference") {
    check(forAll(text) { s =>
      val got = TextKernels.simhash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 60)
      val md = java.security.MessageDigest.getInstance("MD5")
      def h60(tok: String): Long = {
        // reference path: hex-string parse, NOT the byte arithmetic
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      val votes = new Array[Long](60)
      refTokens(s).groupBy(identity).foreach { case (tok, occ) =>
        val h = h60(tok)
        for (b <- 0 until 60)
          votes(b) += (if (((h >> b) & 1L) == 1L) occ.size else -occ.size)
      }
      val want = (0 until 60).map(b =>
        if (votes(b) > 0) 1L << b else 0L).sum
      got == want
    })
  }

  /** In-memory reference asof: brute force over all (direction, tol). */
  private def refAsof(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], dir: AsofDirection,
      tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      val back = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (-r._2, -r._3)).headOption
        .filter(r => tol.forall(t - r._2 <= _))
      val fwd = right.filter(r => r._1 == k && r._2 >= t)
        .sortBy(r => (r._2, -r._3)).headOption
        .filter(r => tol.forall(r._2 - t <= _))
      val pick = dir match {
        case AsofDirection.Backward => back
        case AsofDirection.Forward => fwd
        case AsofDirection.Nearest => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      id -> pick.map(_._3)
    }.toMap

  test("native asof == reference model on random keys/times/directions") {
    import spark.implicits._
    val smallLong = Gen.choose(0L, 4L)
    val ts = Gen.choose(0L, 20L)
    val leftGen = Gen.listOfN(40,
      Gen.zip(smallLong, ts)).map(_.zipWithIndex.map {
        case ((k, t), i) => (i.toLong, k, t) })
    // right side unique per (key, time): index the pairs, payload = index
    val rightGen = Gen.listOfN(25, Gen.zip(smallLong, ts))
      .map(_.distinct.zipWithIndex.map {
        case ((k, t), i) => (k, t, 1000L + i) })
    val dirGen = Gen.oneOf[AsofDirection](AsofDirection.Backward,
      AsofDirection.Forward, AsofDirection.Nearest)
    val tolGen = Gen.oneOf[Option[Long]](None, Some(0L), Some(3L), Some(10L))
    val prop: Prop = forAll(leftGen, rightGen, dirGen, tolGen) {
      (l, r, dir, tol) =>
        val left = l.toDF("id", "k", "t")
        val right = r.toDF("k", "t", "pay")
        val got = AsofJoin.asofJoinNative(left, right, "k", "t",
          Seq("pay"), dir, tol).collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
        got == refAsof(l, r, dir, tol)
    }
    check(prop, minSuccessful(30))
  }

  test("DSIR fixed-point log2: exact at powers of two, monotone, " +
      "error < 0.09 bits on generated positive longs") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val e = graft.text.Sampling.ilog2m20("x")
    def ilog(xs: Seq[Long]): Seq[Long] =
      xs.toDF("x").select(expr(e).as("l")).collect().map(_.getLong(0)).toSeq
    // exact at powers of two: ilog2m20(2^k) == k·2^20
    val pows = (0 to 62).map(1L << _)
    assert(ilog(pows) == (0 to 62).map(_.toLong << 20))
    // piecewise-linear error bound vs true log2 (max ≈ 0.0861 bits at
    // mantissa 1/ln2 − 1), and monotone in x
    val prop = Prop.forAll(Gen.oneOf(
      Gen.choose(1L, 1L << 40),
      Gen.choose(1L << 40, Long.MaxValue - 1))) { x =>
      val Seq(lx, lx1) = ilog(Seq(x, x + 1))
      val err = math.abs(lx / 1048576.0 - math.log(x.toDouble) / math.log(2))
      err < 0.09 && lx <= lx1
    }
    check(prop, minSuccessful(30))
  }

  private def minSuccessful(n: Int) =
    org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n)
  private def check(p: Prop,
      params: org.scalacheck.Test.Parameters =
        org.scalacheck.Test.Parameters.default): Unit = {
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }
}
