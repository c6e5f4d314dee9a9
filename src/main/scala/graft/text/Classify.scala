package graft.text

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Trained TEXT CLASSIFICATION — the supervised twin of the text_langid
  * marker heuristic: a nearest-class-centroid (Rocchio) classifier
  * (Rocchio 1971; Manning, Raghavan & Schütze, IIR §14.2) trained on the
  * corpus's own `lang` labels and evaluated in-plan as a confusion
  * matrix. This is the label-propagation / quality-classifier shape real
  * pipelines run (CCNet's fastText langid, quality classifiers trained
  * on reference corpora): TRAIN = per-class token-frequency centroids,
  * PREDICT = nearest centroid by squared Euclidean distance on
  * term-frequency vectors.
  *
  * Exactness — the whole train+predict loop closes over the integers,
  * so the oracle hash-gates both stages end-to-end:
  *   - doc vector: `f_t = (cnt_t·10³) DIV n_doc` (milli term frequency);
  *   - centroid:  `c_lt = (T_lt·10³) DIV T_l` over the class's token
  *     totals (all operands positive, so DIV ↔ `//` agree);
  *   - `dist²(d,l) = Σf² − 2·Σ f·c + Σc²` — the cross term is the only
  *     per-(doc,class) aggregate; the three sums are exact BIGINTs
  *     (components ≤ 10³, vocab-bounded sums), argmin ties break to the
  *     alphabetically first class, mirroring text_langid.
  *
  * Scale shape: token counting is the usual map-side-combined gram agg;
  * training collapses to (lang, tok) rows — vocab·L, tiny; the cross
  * term joins the per-doc gram stream against the centroid table on
  * `tok` (broadcastable — it IS the model) and aggregates map-side; the
  * scoring grid is L rows per doc from a 5-row broadcast, and the
  * argmin window partitions by doc over those L rows. Corpus-sized
  * exchanges: the gram agg and the per-doc aggs — nothing quadratic,
  * no driver-side model state.
  */
object Classify {

  private val classify = Q(
    "text_classify_centroid",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val d = docs.select(col("doc_id"), col("lang"))
      val tok = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .transform(graft.Checkpoint.of) // feeds doc vectors AND training
      val nd = tok.groupBy("doc_id").agg(sum("cnt").as("n_d"))
      val f = tok.join(nd, "doc_id")
        .select(col("doc_id"), col("tok"),
          expr("cnt * 1000 DIV n_d").as("fm"))
        .transform(graft.Checkpoint.of) // consumed by sf2 and cross
      val lt = tok.join(d, "doc_id")
        .groupBy("lang", "tok").agg(sum("cnt").as("tlt"))
      val tl = lt.groupBy("lang").agg(sum("tlt").as("tl"))
      val c = lt.join(tl, "lang")
        .select(col("lang").as("pred_lang"), col("tok"),
          expr("tlt * 1000 DIV tl").as("cm"))
        .transform(graft.Checkpoint.of) // consumed by sc2 and cross
      val sf2 = f.groupBy("doc_id").agg(sum(col("fm") * col("fm")).as("sf2"))
      val sc2 = c.groupBy("pred_lang")
        .agg(sum(col("cm") * col("cm")).as("sc2"))
      val cross = f.join(c, "tok")
        .groupBy("doc_id", "pred_lang")
        .agg(sum(col("fm") * col("cm")).as("cx"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("dist2"), col("pred_lang"))
      d.join(sf2, Seq("doc_id"), "left")
        .crossJoin(broadcast(sc2))
        .join(cross, Seq("doc_id", "pred_lang"), "left")
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          (coalesce(col("sf2"), lit(0L)) - lit(2) * coalesce(col("cx"),
            lit(0L)) + col("sc2")).as("dist2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    },
    Some("""WITH tok AS (
      SELECT doc_id, u.t AS tok, COUNT(*)::BIGINT AS cnt
      FROM documents,
        UNNEST(list_filter(string_split(text,' '), t -> t <> '')) u(t)
      GROUP BY doc_id, u.t),
    nd AS (SELECT doc_id, SUM(cnt) AS n_d FROM tok GROUP BY doc_id),
    f AS (
      SELECT t.doc_id, t.tok, (t.cnt * 1000) // n.n_d AS fm
      FROM tok t JOIN nd n USING (doc_id)),
    lt AS (
      SELECT d.lang, t.tok, SUM(t.cnt) AS tlt
      FROM tok t JOIN documents d USING (doc_id)
      GROUP BY d.lang, t.tok),
    tl AS (SELECT lang, SUM(tlt) AS tl FROM lt GROUP BY lang),
    c AS (
      SELECT lt.lang AS pred_lang, lt.tok, (lt.tlt * 1000) // tl.tl AS cm
      FROM lt JOIN tl USING (lang)),
    sf2 AS (SELECT doc_id, SUM(fm * fm) AS sf2 FROM f GROUP BY doc_id),
    sc2 AS (SELECT pred_lang, SUM(cm * cm) AS sc2 FROM c GROUP BY pred_lang),
    crs AS (
      SELECT f.doc_id, c.pred_lang, SUM(f.fm * c.cm) AS cx
      FROM f JOIN c USING (tok) GROUP BY f.doc_id, c.pred_lang),
    scored AS (
      SELECT d.doc_id, d.lang, s2.pred_lang,
        COALESCE(sf2.sf2, 0) - 2 * COALESCE(crs.cx, 0) + s2.sc2 AS dist2
      FROM documents d
      LEFT JOIN sf2 USING (doc_id)
      CROSS JOIN sc2 s2
      LEFT JOIN crs ON crs.doc_id = d.doc_id
        AND crs.pred_lang = s2.pred_lang),
    pred AS (
      SELECT doc_id, lang, pred_lang,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY dist2, pred_lang) AS rn
      FROM scored)
    SELECT lang, pred_lang, COUNT(*)::BIGINT AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""))

  val all: Seq[Q] = Seq(classify)
}
