package graft

import org.apache.spark.sql.SparkSession

/** r17 probe: OWN the 1.2–1.5 s gap between knn_graph_search's bench
  * number (4.8–5.6 s in the full-suite session, r17 quiet run) and its
  * fresh-JVM steady state (3.6–3.9 s, WALKPROBE_r16.json). GC is ruled
  * out by the bench contract's queries_gc_ms (31 ms/rep). Remaining
  * suspects, each isolated here in ONE session:
  *
  *   phase A — fresh-session steady state (build excluded): baseline.
  *   phase B — run the full query suite once (bench context), then
  *             re-measure the walk; report the BlockManager's cached-RDD
  *             count (Checkpoint.of localCheckpoints are unpersisted
  *             only when driver GC + ContextCleaner get to them).
  *   phase C — force driver GC, let ContextCleaner drain, re-measure.
  *             Recovery here pins the gap on session-accumulated cached
  *             blocks / driver heap, not on the walk's plan.
  */
object ProbeWalk17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe-walk17")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    // Janino compile activity per rep: Spark's generated-class cache
    // holds spark.sql.codegen.cache.maxEntries (default 100) entries —
    // a 251-query suite can evict every walk stage, making each later
    // rep recompile. The codahale histogram's count = compilations.
    def compiles: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def compileMs: Double = {
      val h = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME
      h.getCount * h.getSnapshot.getMean / 1e6
    }
    def walk(): Double = {
      val (c0, m0) = (compiles, compileMs)
      val t0 = System.nanoTime()
      SparkEntry.queries("knn_graph_search")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe17]   rep $dt%.2f s, ${compiles - c0} compiles, " +
        f"~${compileMs - m0}%.0f ms compiling")
      dt
    }
    def cachedRdds: Int = {
      val m = spark.sparkContext.getClass
        .getMethod("getPersistentRDDs")
      m.invoke(spark.sparkContext)
        .asInstanceOf[scala.collection.Map[Int, _]].size
    }
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "" }
    def report(label: String, reps: Seq[Double]): Unit =
      println(f"[probe17] $label: ${reps.map(r => f"$r%.2f").mkString(", ")} s" +
        f" (cached RDDs: $cachedRdds, loadavg $loadavg)")

    // phase A: fresh steady state, build excluded
    walk() // rep1 = artifact build, discard
    report("A fresh steady state", (1 to 3).map(_ => walk()))

    // phase B: bench context — every other query once
    val t0 = System.nanoTime()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (name != "knn_graph_search")
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[probe17] context $name failed: " +
            e.getMessage.take(120))
        }
    }
    println(f"[probe17] context suite: ${(System.nanoTime() - t0) / 1e9}%.0f s")
    report("B post-suite", (1 to 3).map(_ => walk()))

    // phase C: force cleanup, re-measure
    System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
    report("C post-gc", (1 to 3).map(_ => walk()))
    spark.stop()
  }
}
