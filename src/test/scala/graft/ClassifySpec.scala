package graft

import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {

  /** Independent driver-side Rocchio model: same integer contract
    * (milli frequencies via floor division, exact BIGINT sums, argmin
    * ties to the alphabetically first class), implemented sequentially
    * over collected rows — no Spark expressions shared with the query.
    */
  test("text_classify_centroid == independent driver-side Rocchio model") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val tok: Map[Long, Map[String, Long]] = docs.map { case (id, _, text) =>
      id -> text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    }.toMap
    val langOf = docs.map(d => d._1 -> d._2).toMap

    // class centroids over token totals
    val byLang = docs.map(_._2).distinct.sorted
    val tlt = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    tok.foreach { case (id, m) =>
      m.foreach { case (t, c) => tlt((langOf(id), t)) += c }
    }
    val tl = byLang.map(l =>
      l -> tlt.collect { case ((`l`, _), c) => c }.sum).toMap
    val cm = tlt.map { case ((l, t), c) => (l, t) -> c * 1000L / tl(l) }
    val sc2 = byLang.map(l =>
      l -> cm.collect { case ((`l`, _), v) => v * v }.sum).toMap

    val expected = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.foreach { case (id, lang, _) =>
      val m = tok(id)
      val nd = m.values.sum
      val f = if (nd == 0) Map.empty[String, Long]
              else m.map { case (t, c) => t -> c * 1000L / nd }
      val sf2 = f.values.map(v => v * v).sum
      val pred = byLang.minBy { l =>
        val cx = f.iterator.map { case (t, v) => v * cm.getOrElse((l, t), 0L) }.sum
        (sf2 - 2 * cx + sc2(l), l)
      }
      expected((lang, pred)) += 1L
    }

    val got = SparkEntry.queries("text_classify_centroid")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected.toMap)
    assert(got.values.sum === docs.length) // every doc classified exactly once
  }
}
