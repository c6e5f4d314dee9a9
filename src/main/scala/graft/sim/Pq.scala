package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.functions.CosineSim.{cosineSim, dotProduct}

/** PRODUCT QUANTIZATION ANN (Jégou, Douze & Schmid, TPAMI 2011 — the
  * FAISS `IndexPQ` shape): the vector-compression twin of
  * `knn_ivf_quantized`'s full-dimension int8 scalar quantization.
  * d=64 splits into M=4 16-dim subspaces; each subspace trains its own
  * small codebook (seeded-sample + 2 Lloyd rounds, the
  * [[Knn.codebook]] recipe at subspace width) and every corpus vector
  * compresses to M small codes — 4 bytes standing in for 512. Queries
  * score candidates by ASYMMETRIC DISTANCE COMPUTATION: one M×KSUB
  * look-up table of exact subspace dot products per query, then each
  * candidate costs M array look-ups (not a d-dim float scan); the top
  * [[Pq.RERANK]] ADC hits per query are re-scored with the exact float
  * cosine, exactly the `knn_ivf_quantized` re-rank contract.
  *
  * Deterministic end-to-end, so the whole train→encode→scan→re-rank
  * loop hash-gates:
  *   - sub-codebooks: identical seed rows (md5-order), assignment via
  *     the bit-exact [[graft.functions.NearestCentroid]] kernel, means
  *     as exact DECIMAL(38,6) sums of round(x,6) ÷ count (the
  *     kmeans_train parity recipe, per subspace);
  *   - codes are DENSE 1-based ranks of the surviving centroids
  *     (row_number over cent_id — both engines derive the same map);
  *   - each LUT entry is the sequential-fold dot product (bit-equal to
  *     DuckDB `list_dot_product`), and the ADC score sums the M=4
  *     entries in fixed left-to-right IEEE association — identical
  *     doubles, candidate ORDER tie-broken by vec_id;
  *   - the survivor set is re-ranked by the exact [[cosineSim]] fold.
  *
  * Recall, honestly measured (sf0.001, 10 queries, K=5): 0.42 at
  * RERANK=50 (a random 50-of-499 candidate set would score ~0.10 — the
  * 12-bit codes carry real signal), 0.66 at 100, 0.80 at 150. The
  * ceiling is the corpus, not the operator: on ISOTROPIC gaussian
  * vectors a 4-bit-per-subspace quantizer removes little variance
  * (same analysis as dedup_embedding_lsh's in-code note); on real
  * clustered embedding corpora PQ's distortion — and so its recall at
  * fixed RERANK — is far better. RERANK=50 is the scale-honest
  * default: the re-rank cost is a CONSTANT per query (50 float
  * vectors), not a corpus fraction.
  *
  * Scale shape: training touches the corpus 2·M times but exchanges
  * only KSUB-row centroid tables; encoding is map-side (M kernel calls
  * against 4 one-row broadcast codebooks, zero exchange); the ADC scan
  * broadcasts |Q| rows of (query_id, 4 LUT arrays) against the THIN
  * codes table — the corpus's float vectors are never read by the
  * scan, which is the whole point: at 100 TB the scan reads the 64×
  * smaller codes table, map-filters to per-partition top-RERANK via
  * the partial WindowGroupLimit, and only ≤ RERANK·|Q| survivors
  * re-join the float vectors.
  */
object Pq {

  private val K = 5        // neighbors returned
  private val NQ = 10      // query set = vec_id < NQ
  private val M = 4        // subspaces
  private val SD = 16      // dims per subspace (M·SD = 64)
  private val KSUB = 16    // centroids per subspace
  private val ITER = 2     // Lloyd rounds (kmeans_train parity recipe)
  private val RERANK = 50  // ADC survivors re-scored with exact cosine

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def nc(v: Column, cs: Column): Column =
    org.apache.spark.sql.graft.Shim.column(graft.functions.NearestCentroid(
      org.apache.spark.sql.graft.Shim.expression(v),
      org.apache.spark.sql.graft.Shim.expression(cs)))

  private def sub(m: Int, v: Column): Column = slice(v, m * SD + 1, SD)

  /** Train ALL M sub-codebooks jointly; output (m, code 1..≤KSUB dense
    * LONG, cv). One Lloyd chain keyed by (m, cent_id) instead of M
    * sequential per-subspace chains: the corpus explodes once to
    * (vec_id, m, sv) rows and every round is ONE assignment + ONE
    * grouped mean job covering all subspaces — M× fewer Spark jobs and
    * checkpoint barriers for byte-identical per-subspace arithmetic
    * (the seed set, the kernel's per-m sorted centroid array, the
    * DECIMAL(38,6) sums per (m, cent_id), and the per-m dense-rank
    * codes are each exactly what the sequential chain computed).
    */
  private def subCodebooks(e: DataFrame): DataFrame = {
    val sve = e.select(col("vec_id"), explode(array((0 until M).map(m =>
        struct(lit(m).as("m"), sub(m, col("v")).as("sv"))): _*)).as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
    val hk = conv(substring(md5(col("vec_id").cast("string")), 1, 15),
      16, 10).cast("long")
    // the seed ROWS are the same md5-ordered vec_ids in every subspace —
    // one corpus sort-limit, joined back to the m-exploded slices
    val seedIds = e.select(col("vec_id"), hk.as("hk"))
      .orderBy("hk", "vec_id").limit(KSUB).select("vec_id")
    val seeds = sve.join(seedIds, "vec_id")
      .select(col("m"), col("vec_id").as("cent_id"), col("sv").as("cv"))
      .transform(graft.Checkpoint.of)
    val trained = (1 to ITER).foldLeft(seeds) { (cents, _) =>
      val centArr = cents.groupBy("m").agg(
        array_sort(collect_list(struct(col("cent_id"), col("cv")))).as("cs"))
      val sums = (0 until SD).map(i =>
        sum(round(element_at(col("sv"), i + 1), 6)
          .cast(DecimalType(38, 6))).as(s"s$i"))
      sve.join(broadcast(centArr), "m")
        .withColumn("cent_id", nc(col("sv"), col("cs")))
        .groupBy("m", "cent_id")
        .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        .select(col("m"), col("cent_id"), array((0 until SD).map(i =>
          col(s"s$i").cast("double") / col("n")): _*).as("cv"))
        .transform(graft.Checkpoint.of)
    }
    trained
      .withColumn("code", row_number().over(
        Window.partitionBy("m").orderBy("cent_id")).cast("long"))
      .select("m", "code", "cv")
      .transform(graft.Checkpoint.of)
  }

  /** Per-subspace one-row broadcast codebook arrays (code-ASC sorted so
    * the kernel's strict-> scan reproduces (cos DESC, code ASC)) off the
    * jointly-trained table — M tiny filters of one checkpointed frame.
    */
  private def cbArraysOf(cbs: DataFrame): Seq[DataFrame] =
    (0 until M).map(m => cbs.filter(col("m") === m).agg(
      array_sort(collect_list(
        struct(col("code").as("cent_id"), col("cv")))).as(s"cs$m")))

  private def cbArrays(e: DataFrame): Seq[DataFrame] =
    cbArraysOf(subCodebooks(e))

  private val pq = Q(
    "knn_pq",
    (s, dir) => {
      val e = emb(s, dir)
      val cbArrs = cbArrays(e)
      // ENCODE: M map-side kernel calls, zero exchange — the codes table
      // is the 4-codes-per-vector compressed corpus
      val codes = cbArrs.zipWithIndex.foldLeft(e) { case (df, (cb, m)) =>
        df.crossJoin(broadcast(cb))
          .withColumn(s"k$m", nc(sub(m, col("v")), col(s"cs$m")))
          .drop(s"cs$m")
      }.select(col("vec_id") +: (0 until M).map(m => col(s"k$m")): _*)
        .transform(graft.Checkpoint.of)
      // per-query ADC look-up tables (code-ASC order = array position);
      // interpreted HOF is fine here: NQ rows, built once, checkpointed
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val qlut = cbArrs.zipWithIndex.foldLeft(q) { case (df, (cb, m)) =>
        df.crossJoin(broadcast(cb))
          .withColumn(s"lut$m", transform(col(s"cs$m"),
            c => dotProduct(sub(m, col("qv")), c.getField("cv"))))
          .drop(s"cs$m")
      }.drop("qv").transform(graft.Checkpoint.of)
      // ADC SCAN over the thin codes table: 4 look-ups + 3 adds per
      // candidate, fixed left-to-right association both engines
      val score = (0 until M).map(m =>
        element_at(col(s"lut$m"), col(s"k$m").cast("int"))).reduceLeft(_ + _)
      val wA = Window.partitionBy(col("query_id"))
        .orderBy(score.desc, col("vec_id"))
      val topr = codes.join(broadcast(qlut),
          col("query_id") =!= col("vec_id"))
        .withColumn("rr", row_number().over(wA))
        .filter(col("rr") <= RERANK)
        .select("query_id", "vec_id")
      // exact re-rank of the survivors only
      val cos = cosineSim(col("qv"), col("v"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(cos.desc, col("vec_id"))
      topr.join(e, "vec_id").join(broadcast(q), "query_id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(cos, 6).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some {
      val perSub = (0 until M).map(m =>
        subSql(m, "", "e", "seeds") + s""",
        lut$m AS (SELECT q.query_id,
            list(list_dot_product(q.qv[${m * SD + 1}:${(m + 1) * SD}],
              cb.cv) ORDER BY cb.code) AS lut
          FROM q, cb_$m cb GROUP BY q.query_id)""").mkString(",\n    ")
      val adc = (0 until M).map(m => s"l$m.lut[c.k$m]").mkString(" + ")
      s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      seeds AS (SELECT vec_id, v FROM e
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
          vec_id
        LIMIT $KSUB),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NQ),
      $perSub,
      codes AS (SELECT k0.vec_id, k0.code AS k0, k1.code AS k1,
          k2.code AS k2, k3.code AS k3
        FROM k0 JOIN k1 USING (vec_id) JOIN k2 USING (vec_id)
        JOIN k3 USING (vec_id)),
      topr AS (SELECT query_id, vec_id FROM (
        SELECT l0.query_id, c.vec_id,
          row_number() OVER (PARTITION BY l0.query_id
            ORDER BY $adc DESC, c.vec_id) AS rr
        FROM codes c, lut0 l0
        JOIN lut1 l1 USING (query_id) JOIN lut2 l2 USING (query_id)
        JOIN lut3 l3 USING (query_id)
        WHERE l0.query_id <> c.vec_id) WHERE rr <= $RERANK)
      SELECT query_id, neighbor_id, rank, cosine FROM (
        SELECT t.query_id, t.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY t.query_id
            ORDER BY list_cosine_similarity(q.qv, e.v) DESC, t.vec_id)
            AS rank,
          round(list_cosine_similarity(q.qv, e.v), 6) AS cosine
        FROM topr t
        JOIN q ON t.query_id = q.query_id
        JOIN e ON t.vec_id = e.vec_id)
      WHERE rank <= $K ORDER BY query_id, rank"""
    })

  /** Per-subspace mirror chain over `base`(vec_id, v) seeded from
    * `seeds`(vec_id, v): ${p}sv$m slices, 2 Lloyd rounds, dense-code
    * table cb_$m (no prefix — shared name shape with the LUT/codes
    * consumers), corpus assignment k$m. `p` keeps the two chains of a
    * query that trains on both raw vectors and residuals disjoint.
    */
  private def subSql(m: Int, p: String, base: String,
      seeds: String): String = {
    val lo = m * SD + 1; val hi = (m + 1) * SD
    val meanList = (1 to SD).map(i =>
      s"CAST(SUM(CAST(round(sv[$i],6) AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*)")
      .mkString("[", ",\n          ", "]")
    def lloyd(prev: String, a: String, c: String): String =
      s"""$a AS (SELECT vec_id, sv, cent_id FROM (
        SELECT s.vec_id, s.sv, c.cent_id,
          row_number() OVER (PARTITION BY s.vec_id
            ORDER BY list_cosine_similarity(s.sv, c.cv) DESC, c.cent_id)
            AS rk
        FROM ${p}sv$m s, $prev c) WHERE rk = 1),
      $c AS (SELECT cent_id, $meanList AS cv FROM $a GROUP BY cent_id)"""
    s"""${p}sv$m AS (SELECT vec_id, v[$lo:$hi] AS sv FROM $base),
      ${p}c0_$m AS (SELECT vec_id AS cent_id, v[$lo:$hi] AS cv FROM $seeds),
      ${lloyd(s"${p}c0_$m", s"${p}a1_$m", s"${p}c1_$m")},
      ${lloyd(s"${p}c1_$m", s"${p}a2_$m", s"${p}c2_$m")},
      cb_$m AS (SELECT row_number() OVER (ORDER BY cent_id) AS code, cv
        FROM ${p}c2_$m),
      k$m AS (SELECT vec_id, code FROM (
        SELECT s.vec_id, cb.code,
          row_number() OVER (PARTITION BY s.vec_id
            ORDER BY list_cosine_similarity(s.sv, cb.cv) DESC, cb.code)
            AS rk
        FROM ${p}sv$m s, cb_$m cb) WHERE rk = 1)"""
  }

  // ---------------------------------------------------- knn_pq_distortion
  /** PQ RECONSTRUCTION-ERROR report — the compression-quality card for
    * the [[pq]] encoder (emb_matryoshka audits the dimension axis,
    * emb_quantize_recall the int8 precision axis; this audits the PQ
    * codebook axis): per subspace, the mean squared error between each
    * vector's slice and its assigned centroid — the number that decides
    * KSUB/M before a 100 TB corpus is committed to 64×-smaller codes
    * (Jégou et al. 2011 §IV's distortion curve).
    *
    * Exactness: slices lift to the exact round(x,6) micro integers and
    * the trained centroids to FLOOR-micro integers (`floor(cv·10⁶)` —
    * cv is already a bit-identical double both engines: decimal-exact
    * sums ÷ count in one IEEE division, then one IEEE multiply and a
    * floor), so every squared error is an exact BIGINT and the
    * per-subspace totals are exact DECIMAL(38,0)/HUGEINT sums — the
    * only FP in the output is the final total→DOUBLE cast and ONE IEEE
    * division per row. Scale: encode is the [[pq]] map-side kernel
    * chain (zero exchange); components posexplode map-side and join
    * the n-row codes table CO-PARTITIONED on vec_id and the ≤M·KSUB·SD
    * = 1024-row broadcast centroid components; the aggregate map-side-
    * combines onto M keys.
    */
  private val pqDistortion = Q(
    "knn_pq_distortion",
    (s, dir) => {
      val dec = DecimalType(38, 0)
      val e = emb(s, dir)
      val cbArrs = cbArrays(e)
      val codes = cbArrs.zipWithIndex.foldLeft(e) { case (df, (cb, m)) =>
        df.crossJoin(broadcast(cb))
          .withColumn(s"k$m", nc(sub(m, col("v")), col(s"cs$m")))
          .drop(s"cs$m")
      }.select(col("vec_id") +: (0 until M).map(m => col(s"k$m")): _*)
      val cbcomp = cbArrs.zipWithIndex.map { case (cb, m) =>
        cb.select(explode(col(s"cs$m")).as("c"))
          .select(lit(m).as("m"), col("c.cent_id").as("code"),
            posexplode(col("c.cv")).as(Seq("p0", "cx")))
          .select(col("m"), col("code"), col("p0"),
            floor(col("cx") * lit(1000000.0)).as("ci"))
      }.reduce(_ unionByName _)
      val comp = e
        .select(col("vec_id"), posexplode(col("v")).as(Seq("i0", "x")))
        .select(col("vec_id"), expr(s"CAST(i0 DIV $SD AS INT)").as("m"),
          expr(s"i0 % $SD").as("p0"),
          (round(col("x"), 6).cast(DecimalType(38, 6)) * lit(1000000))
            .cast(dec).cast("long").as("mi"))
      comp.join(codes, "vec_id")
        .withColumn("code", element_at(
          array((0 until M).map(m => col(s"k$m")): _*),
          (col("m") + 1).cast("int")))
        .join(broadcast(cbcomp), Seq("m", "code", "p0"))
        .groupBy("m")
        .agg(count(lit(1)).as("n_comp"),
          // cast BEFORE the sum: the per-component square fits a long,
          // but the corpus-scale TOTAL must accumulate in decimal (the
          // oracle sums into HUGEINT)
          sum(((col("mi") - col("ci")) * (col("mi") - col("ci")))
            .cast(dec)).cast(dec).as("total"))
        .select(col("m"), expr(s"n_comp DIV $SD").as("n_vectors"),
          col("total").cast("double").as("total_se"),
          (col("total").cast("double") / expr(s"n_comp DIV $SD"))
            .as("mse"))
        .orderBy("m")
    },
    Some {
      val chains = (0 until M).map(m => subSql(m, "", "e", "seeds"))
        .mkString(",\n      ")
      val cbcomp = (0 until M).map(m =>
        s"""SELECT $m AS m, code, u.s.p AS p0,
          FLOOR(u.s.c * 1000000)::BIGINT AS ci
        FROM cb_$m, UNNEST([struct_pack(p := i - 1, c := cv[i])
          for i in range(1, len(cv) + 1)]) u(s)""").mkString(
        "\n        UNION ALL\n        ")
      s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      seeds AS (SELECT vec_id, v FROM e
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
          vec_id
        LIMIT $KSUB),
      $chains,
      codes AS (SELECT k0.vec_id, k0.code AS k0, k1.code AS k1,
          k2.code AS k2, k3.code AS k3
        FROM k0 JOIN k1 USING (vec_id) JOIN k2 USING (vec_id)
        JOIN k3 USING (vec_id)),
      cbcomp AS MATERIALIZED (
        $cbcomp),
      comp AS (
        SELECT vec_id, (u.s.i // $SD)::INT AS m, (u.s.i % $SD)::INT AS p0,
          ((round(u.s.x, 6)::DECIMAL(38,6) * 1000000)::HUGEINT)::BIGINT
            AS mi
        FROM e, UNNEST([struct_pack(i := k - 1, x := v[k])
          for k in range(1, len(v) + 1)]) u(s)),
      err AS (
        SELECT c.m, COUNT(*)::BIGINT AS n_comp,
          SUM((c.mi - cb.ci) * (c.mi - cb.ci)) AS total
        FROM comp c
        JOIN codes k USING (vec_id)
        JOIN cbcomp cb ON cb.m = c.m AND cb.p0 = c.p0
          AND cb.code = ([k.k0, k.k1, k.k2, k.k3])[c.m + 1]
        GROUP BY c.m)
      SELECT m, (n_comp // $SD)::BIGINT AS n_vectors,
        CAST(total AS DOUBLE) AS total_se,
        CAST(total AS DOUBLE) / (n_comp // $SD) AS mse
      FROM err ORDER BY m"""
    })

  private def vecSub(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(graft.functions.VecSub(
      org.apache.spark.sql.graft.Shim.expression(a),
      org.apache.spark.sql.graft.Shim.expression(b)))

  /** IVF + PQ — the production FAISS `IndexIVFPQ` shape and the ANN
    * capstone: the trained IVF codebook partitions the corpus into
    * inverted lists ([[Knn.codebook]]/[[Knn.assign]], unchanged), PQ
    * compresses each vector's RESIDUAL (x − its centroid — residuals
    * concentrate around 0, which is exactly why FAISS quantizes them
    * instead of raw vectors), queries probe NPROBE lists and score
    * candidates by ADC against a PER-(query, probed-centroid) LUT of
    * residual subspace dot products, and the top-RERANK survivors
    * re-rank with the exact float cosine on the ORIGINAL vectors.
    *
    * Exactness composes from the proven pieces: IVF train/assign/probe
    * are knn_ivf's (bit-gated there); residuals are elementwise IEEE
    * subtraction via the [[graft.functions.VecSub]] codegen kernel
    * (bit-equal to DuckDB's indexed `list_transform` — no fold, no
    * ordering subtlety); sub-codebook training/encoding and the
    * fixed-order ADC sum are knn_pq's. Scale shape: everything knn_pq
    * does PLUS the scan only touches the probed lists' codes (the
    * cent_id equi-join replaces knn_pq's full-corpus broadcast scan) —
    * at 100 TB the ADC scan reads nprobe/nlist of a codes table that is
    * already 64× thinner than the vectors.
    */
  private val ivfpq = Q(
    "knn_ivfpq",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = Knn.codebook(e)
      // residual corpus: (vec_id, cent_id, v = x − centroid)
      val res = Knn.assign(e, cents)
        .join(broadcast(cents), "cent_id")
        .select(col("vec_id"), col("cent_id"),
          vecSub(col("v"), col("cv")).as("v"))
        .transform(graft.Checkpoint.of)
      val cbArrs = cbArrays(res)
      // inverted lists carry (cent_id, 4 residual codes) — no floats
      val codes = cbArrs.zipWithIndex.foldLeft(res) { case (df, (cb, m)) =>
        df.crossJoin(broadcast(cb))
          .withColumn(s"k$m", nc(sub(m, col("v")), col(s"cs$m")))
          .drop(s"cs$m")
      }.select(col("vec_id") +: col("cent_id") +:
          (0 until M).map(m => col(s"k$m")): _*)
        .transform(graft.Checkpoint.of)
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      // per-(query, probed-centroid) residual LUTs
      val qres = Knn.probe(q, cents, Knn.NPROBE)
        .join(broadcast(cents), "cent_id")
        .select(col("query_id"), col("cent_id"),
          vecSub(col("qv"), col("cv")).as("qv"))
      val qlut = cbArrs.zipWithIndex.foldLeft(qres) { case (df, (cb, m)) =>
        df.crossJoin(broadcast(cb))
          .withColumn(s"lut$m", transform(col(s"cs$m"),
            c => dotProduct(sub(m, col("qv")), c.getField("cv"))))
          .drop(s"cs$m")
      }.drop("qv").transform(graft.Checkpoint.of)
      val score = (0 until M).map(m =>
        element_at(col(s"lut$m"), col(s"k$m").cast("int"))).reduceLeft(_ + _)
      val wA = Window.partitionBy(col("query_id"))
        .orderBy(score.desc, col("vec_id"))
      val topr = codes.join(broadcast(qlut), "cent_id")
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("rr", row_number().over(wA))
        .filter(col("rr") <= RERANK)
        .select("query_id", "vec_id")
      val cos = cosineSim(col("qv"), col("v"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(cos.desc, col("vec_id"))
      topr.join(e, "vec_id").join(broadcast(q), "query_id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(cos, 6).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some {
      val perSub = (0 until M).map(m =>
        subSql(m, "r", "res", "rseeds") + s""",
        lut$m AS (SELECT qr.query_id, qr.cent_id,
            list(list_dot_product(qr.qv[${m * SD + 1}:${(m + 1) * SD}],
              cb.cv) ORDER BY cb.code) AS lut
          FROM qres qr, cb_$m cb GROUP BY qr.query_id, qr.cent_id)""")
        .mkString(",\n    ")
      val adc = (0 until M).map(m => s"l$m.lut[c.k$m]").mkString(" + ")
      val lutJoins = (1 until M).map(m =>
        s"JOIN lut$m l$m ON l$m.query_id = l0.query_id" +
          s" AND l$m.cent_id = l0.cent_id").mkString(" ")
      s"""WITH ${Knn.sqlIvfCtes},
      res AS (
        SELECT a.vec_id, a.cent_id,
          list_transform(a.v, (x, i) -> x - c.cv[i]) AS v
        FROM assigned a JOIN c2 c USING (cent_id)),
      rseeds AS (SELECT vec_id, v FROM res
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
          vec_id
        LIMIT $KSUB),
      qres AS (
        SELECT p.query_id, p.cent_id,
          list_transform(p.qv, (x, i) -> x - c.cv[i]) AS qv
        FROM probes p JOIN c2 c USING (cent_id)),
      $perSub,
      codes AS (SELECT r.vec_id, r.cent_id, k0.code AS k0, k1.code AS k1,
          k2.code AS k2, k3.code AS k3
        FROM res r JOIN k0 USING (vec_id) JOIN k1 USING (vec_id)
        JOIN k2 USING (vec_id) JOIN k3 USING (vec_id)),
      topr AS (SELECT query_id, vec_id FROM (
        SELECT l0.query_id, c.vec_id,
          row_number() OVER (PARTITION BY l0.query_id
            ORDER BY $adc DESC, c.vec_id) AS rr
        FROM lut0 l0 $lutJoins
        JOIN codes c ON c.cent_id = l0.cent_id
        WHERE l0.query_id <> c.vec_id) WHERE rr <= $RERANK)
      SELECT query_id, neighbor_id, rank, cosine FROM (
        SELECT t.query_id, t.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY t.query_id
            ORDER BY list_cosine_similarity(q.qv, e.v) DESC, t.vec_id)
            AS rank,
          round(list_cosine_similarity(q.qv, e.v), 6) AS cosine
        FROM topr t
        JOIN q ON t.query_id = q.query_id
        JOIN e ON t.vec_id = e.vec_id)
      WHERE rank <= $K ORDER BY query_id, rank"""
    })

  // ------------------------------------------------ knn_ivfpq_persisted
  /** The IVFPQ index PERSISTED — the production FAISS `IndexIVFPQ`
    * lifecycle next to [[Knn.buildIvfIndex]]'s flat-IVF one: train
    * once, store `{cents, subcents, codes}`, query many. What survives
    * on storage is the NLIST-row coarse codebook, the M·KSUB-row
    * residual sub-codebooks, and the codes table — (vec_id, cent_id,
    * k0..k3) longs PARTITIONED BY (cent_id, ingest_id), 64× thinner
    * than the vectors it stands for; queries DPP-prune it to their
    * probed cells. The exact re-rank reads survivor rows from a
    * caller-supplied vector table (the FAISS refine-index shape — raw
    * vectors live beside, not inside, the compressed index).
    *
    * Codebooks (coarse AND sub) stay FROZEN across appends — the
    * add-after-train contract [[Knn.appendIvfIndex]] documents; floats
    * round-trip parquet bit-exactly and codes are longs, so
    * `knn_ivfpq_persisted` is gated by knn_ivfpq's oracle verbatim.
    */
  def buildIvfPqIndex(e: DataFrame, path: String): Unit = {
    pqBuildCount += 1
    val cents = Knn.codebook(e)
    cents.write.mode("overwrite").parquet(s"$path/cents")
    val res = Knn.assign(e, cents)
      .join(broadcast(cents), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        vecSub(col("v"), col("cv")).as("v"))
      .transform(graft.Checkpoint.of)
    val subs = subCodebooks(res)
    subs.write.mode("overwrite").parquet(s"$path/subcents")
    encode(res, cbArraysOf(subs)).withColumn("ingest_id", lit(0L))
      .write.mode("overwrite").partitionBy("cent_id", "ingest_id")
      .parquet(s"$path/codes")
  }

  /** Residual-encode an assigned (vec_id, cent_id, v=residual) frame
    * against per-subspace codebook arrays → (vec_id, cent_id, k0..kM).
    */
  private def encode(res: DataFrame, cbArrs: Seq[DataFrame]): DataFrame =
    cbArrs.zipWithIndex.foldLeft(res) { case (df, (cb, m)) =>
      df.crossJoin(broadcast(cb))
        .withColumn(s"k$m", nc(sub(m, col("v")), col(s"cs$m")))
        .drop(s"cs$m")
    }.select(col("vec_id") +: col("cent_id") +:
      (0 until M).map(m => col(s"k$m")): _*)

  /** Incrementally ingest a vector slice: assign + residual-encode
    * against the FROZEN stored codebooks, land in the slice's own
    * (cent_id, ingest_id) partitions — replay-idempotent, associative
    * (each code depends only on frozen state; PqSpec pins append ≡
    * encoding the union).
    */
  def appendIvfPqIndex(s: SparkSession, path: String, e: DataFrame,
      ingestId: Long): Unit = {
    require(ingestId > 0,
      s"ingestId must be > 0 (0 = base build), got $ingestId")
    Knn.requireFreshIds(s, s"$path/codes", e, ingestId, "appendIvfPqIndex")
    val cents = s.read.parquet(s"$path/cents")
    val subs = s.read.parquet(s"$path/subcents")
    val res = Knn.assign(e, cents)
      .join(broadcast(cents), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        vecSub(col("v"), col("cv")).as("v"))
    encode(res, cbArraysOf(subs)).withColumn("ingest_id", lit(ingestId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cent_id", "ingest_id").parquet(s"$path/codes")
  }

  /** Maintenance: fold appended code slices into the base partitions
    * ([[graft.sources.Sources.foldIngestPartitions]]; answers and ADC
    * ranks unchanged — codes are frozen-codebook deterministic).
    */
  def compactIvfPqIndex(s: SparkSession, path: String): (Int, Int) =
    graft.sources.Sources.foldIngestPartitions(s, s"$path/codes")

  /** TAKEDOWN: drop vectors from the codes table — partition-pruned
    * ([[Knn.deleteFromLists]] on the thin codes layout); codebooks
    * frozen, other codes can't move.
    */
  def removeFromIvfPqIndex(s: SparkSession, path: String,
      vecIds: DataFrame): Unit =
    Knn.deleteFromLists(s, s"$path/codes",
      graft.Checkpoint.of(vecIds.select("vec_id").distinct()))

  /** Query the persisted index: probe → per-(query, probed-cell)
    * residual LUTs → ADC over the DPP-pruned codes partitions → exact
    * re-rank of the top-[[RERANK]] survivors against `vectors`
    * (vec_id, v — the raw corpus table). Mirrors [[ivfpq]]'s plan with
    * storage reads replacing the train/encode stages.
    */
  def queryIvfPqIndex(s: SparkSession, path: String, q: DataFrame,
      vectors: DataFrame, k: Int = K, nprobe: Int = Knn.NPROBE,
      rerank: Int = RERANK): DataFrame = {
    val cents = s.read.parquet(s"$path/cents")
    val cbArrs = cbArraysOf(s.read.parquet(s"$path/subcents"))
    val codes = s.read.parquet(s"$path/codes")
      .withColumn("cent_id", col("cent_id").cast("long"))
    val qres = Knn.probe(q, cents, nprobe)
      .join(broadcast(cents), "cent_id")
      .select(col("query_id"), col("cent_id"),
        vecSub(col("qv"), col("cv")).as("qv"))
    // NOT checkpointed (unlike ivfpq's LUT over live training lineage):
    // here the LUT derives from stored parquet + the filtered query
    // scan, and a checkpoint would replace that file-scan lineage with
    // a LogicalRDD — erasing the selective predicate DPP needs to plan
    // the probe set as a partition filter on the codes read (the
    // literal-LocalRelation trap)
    val qlut = cbArrs.zipWithIndex.foldLeft(qres) { case (df, (cb, m)) =>
      df.crossJoin(broadcast(cb))
        .withColumn(s"lut$m", transform(col(s"cs$m"),
          c => dotProduct(sub(m, col("qv")), c.getField("cv"))))
        .drop(s"cs$m")
    }.drop("qv")
    val score = (0 until M).map(m =>
      element_at(col(s"lut$m"), col(s"k$m").cast("int"))).reduceLeft(_ + _)
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(score.desc, col("vec_id"))
    val topr = codes.join(broadcast(qlut), "cent_id")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("rr", row_number().over(wA))
      .filter(col("rr") <= rerank)
      .select("query_id", "vec_id")
    val cos = cosineSim(col("qv"), col("v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(cos.desc, col("vec_id"))
    topr.join(vectors, "vec_id").join(broadcast(q), "query_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(cos, 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  private[graft] var pqBuildCount = 0

  private val builtPq =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Bench warm-up hook: force the one-time session-cached artifact
    * build so timed reps measure steady-state reads.
    */
  private[graft] def prime(s: SparkSession, dir: String): Unit = {
    cachedPq(s, dir); ()
  }

  private def cachedPq(s: SparkSession, dir: String): String =
    builtPq.getOrElseUpdate(dir, {
      val name = "graft-ivfpq-" + dir.replaceAll("[^A-Za-z0-9.]+", "_")
      val path = new org.apache.hadoop.fs.Path(
        graft.Indexes.root(s), name).toString
      buildIvfPqIndex(emb(s, dir), path)
      path
    })

  private val ivfpqPersisted = Q(
    "knn_ivfpq_persisted",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      queryIvfPqIndex(s, cachedPq(s, dir), q, e)
    },
    ivfpq.oracle)

  val all: Seq[Q] = Seq(pq, pqDistortion, ivfpq, ivfpqPersisted)
}
