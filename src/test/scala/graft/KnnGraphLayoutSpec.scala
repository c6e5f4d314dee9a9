package graft

import org.apache.spark.sql.functions._

import graft.sim.Knn

/** The kNN-graph artifact's SEARCH LAYOUT (sym/medoids/celladj) turns
  * the beam walk's per-round candidate fetch into directory-pruned
  * reads (VERDICT r14 #1: the walk previously joined each round's
  * broadcast id set against a FULL scan of the stored lists — HOPS+1
  * corpus scans per query batch). On a CLUSTERED corpus (the geometry
  * real embedding corpora have; the driver's isotropic synthetic
  * vectors make every cell adjacent to every cell, so pruning is
  * honest-to-measure only with locality) the walk must read a small
  * fraction of the bytes the unpruned form would.
  */
class KnnGraphLayoutSpec extends SparkSpec {

  /** Deterministic clustered corpus: `n` vectors in `nc` well-separated
    * clusters (one-hot direction ×10 + small integer jitter) — within-
    * cluster cosine ≈ 1, across ≈ 0, so kNN edges stay in-cluster and
    * the cell-adjacency table is near-diagonal.
    */
  private def clustered(n: Int, nc: Int, dim: Int) = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val c = (i % nc).toInt
      val v = Array.tabulate(dim) { d =>
        val jitter = ((i * 31 + d * 7) % 11 - 5).toDouble / 50.0
        (if (d == c) 10.0 else 0.0) + jitter
      }
      (i, v.toSeq)
    }.toDF("vec_id", "v")
  }

  test("beam-walk fetch is directory-pruned: bytes read per walk stay " +
      "far below the unpruned (per-round full-scan) floor, and the " +
      "walk answers from the right cluster") {
    val dim = 64
    val nc = 32
    val e = Checkpoint.of(clustered(2048, nc, dim))
    // cheap nlist=nc codebook (plain-double Lloyd — no oracle here)
    var cents = e.select(col("vec_id").as("cent_id"), col("v").as("cv"))
      .filter(col("cent_id") < nc)
      .transform(Checkpoint.of)
    for (_ <- 1 to 2) {
      cents = Knn.assign(e, cents).groupBy("cent_id")
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .transform(Checkpoint.of)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-kg-layout")
    try {
      val path = dir.toString
      Knn.buildKnnGraphIndexWith(e, cents, path)
      // pre-localize the query batch: deriving it from the cached
      // corpus INSIDE the measured region would count the corpus
      // blocks as bytesRead (cached-block reads hit inputMetrics) and
      // drown the artifact-fetch signal this spec measures
      val qRows = e.filter(col("vec_id") === 100L)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .collect()
      val q = spark.createDataFrame(
        java.util.Arrays.asList(qRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("qv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          bytes.addAndGet(ev.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      val rows = try {
        val (res, _) = Knn.graphSearchAt(spark, path, q,
          nSeeds = 2, width = 24, hops = 8)
        res.collect()
      } finally {
        org.apache.spark.sql.graft.Shim.waitListeners(spark)
        spark.sparkContext.removeSparkListener(listener)
      }
      // the query is cluster 100 % 32 = 4; every returned neighbor must
      // share that cluster (within-cluster cosine ≈ 1 vs ≈ 0 across)
      assert(rows.length == 5)
      assert(rows.forall(_.getLong(1) % nc == 100L % nc),
        "walk must answer from the query's cluster")
      def sizeOf(sub: String): Long = {
        def sz(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
        sz(new java.io.File(s"$path/$sub"))
      }
      val unprunedFloor = 9 * sizeOf("lists") + 8 * sizeOf("sym")
      val read = bytes.get()
      info(s"walk read $read bytes; unpruned floor $unprunedFloor")
      assert(read < unprunedFloor / 4,
        s"pruned walk must read far below the per-round full-scan " +
          s"floor ($read vs $unprunedFloor)")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }
}
