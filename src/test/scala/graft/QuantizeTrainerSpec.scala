package graft

import org.apache.spark.sql.functions._

/** r17: the PCA trainers moved from in-plan window-aggregate loops to
  * driver-side BigInt over the collected d²-row scatter mirror (bounded,
  * corpus-independent state). These pins prove the move changed NOTHING
  * the oracle can see: both forms produce bit-identical integers on the
  * real corpus and on a constructed anisotropic one.
  */
class QuantizeTrainerSpec extends SparkSpec {

  import sim.Quantize.{scatterMirror, collectScatter, powerVec, pca2Vecs,
    powerIterateFrom, pca2IterateFrom}

  private def embOf(dir: String) =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** (j -> v) of the in-plan single-component trainer. */
  private def planPower(sm: org.apache.spark.sql.DataFrame): Map[Long, BigInt] =
    powerIterateFrom(sm).collect()
      .map(r => r.getLong(0) -> BigInt(r.getDecimal(1).toBigIntegerExact))
      .toMap

  private def planPca2(sm: org.apache.spark.sql.DataFrame)
      : Map[Long, (BigInt, BigInt)] =
    pca2IterateFrom(sm).collect()
      .map(r => r.getLong(0) -> ((BigInt(r.getDecimal(1).toBigIntegerExact),
        BigInt(r.getDecimal(2).toBigIntegerExact)))).toMap

  test("driver powerVec == in-plan powerIterateFrom, bit-exact (sf0.001)") {
    val sm = scatterMirror(embOf(sfDir))
    val (dims, mat) = collectScatter(sm)
    val got = powerVec(mat)
    val want = planPower(sm)
    assert(dims.length == want.size)
    dims.indices.foreach { a =>
      assert(got(a) == want(dims(a)), s"dim ${dims(a)}: ${got(a)} != ${want(dims(a))}")
    }
  }

  test("driver pca2Vecs == in-plan pca2IterateFrom, bit-exact (sf0.001)") {
    val sm = scatterMirror(embOf(sfDir))
    val (dims, mat) = collectScatter(sm)
    val (va, vb) = pca2Vecs(dims, mat)
    val want = planPca2(sm)
    assert(dims.length == want.size)
    dims.indices.foreach { a =>
      assert((va(a), vb(a)) == want(dims(a)),
        s"dim ${dims(a)}: (${va(a)},${vb(a)}) != ${want(dims(a))}")
    }
  }

  test("driver == in-plan on a constructed anisotropic 5-dim corpus " +
      "(negative components, odd d, non-trivial deflation)") {
    import spark.implicits._
    // 12 vectors, d=5: strong first direction + noise so the quotient
    // truncations and the Gram-Schmidt deflation all take effect
    val vecs = (0 until 12).map { k =>
      (k.toLong, Array.tabulate(5) { d =>
        val base = if (d == 0) 1.0 + 0.1 * k else 0.0
        base + math.sin(k * 2.7 + d * 1.3) * (0.2 + 0.05 * d) - 0.1 * d
      })
    }
    val e = vecs.toDF("vec_id", "v")
    val sm = scatterMirror(e)
    val (dims, mat) = collectScatter(sm)
    assert(dims.toSeq == (1L to 5L))
    val got1 = powerVec(mat)
    val want1 = planPower(sm)
    dims.indices.foreach(a => assert(got1(a) == want1(dims(a))))
    val (va, vb) = pca2Vecs(dims, mat)
    val want2 = planPca2(sm)
    dims.indices.foreach(a => assert((va(a), vb(a)) == want2(dims(a))))
    // deflation really happened: vb not proportional to va
    assert(va.toSeq != vb.toSeq)
  }

  test("collectScatter raises loudly past MAX_TRAINER_DIM instead of " +
      "silently collecting a big matrix") {
    import spark.implicits._
    val wide = Seq((1L, Array.fill(600)(1.0)), (2L, Array.fill(600)(2.0)))
      .toDF("vec_id", "v")
    val ex = intercept[IllegalArgumentException] {
      collectScatter(scatterMirror(wide))
    }
    assert(ex.getMessage.contains("MAX_TRAINER_DIM"))
  }
}
