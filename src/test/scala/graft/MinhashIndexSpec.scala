package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinhashIndex}

/** Persisted MinHash bucket index: check == the direct cross-side
  * collision model, and append is equivalent to having built from the
  * union (the incremental-ingest contract).
  */
class MinhashIndexSpec extends SparkSpec {

  private def docs(pred: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .filter(expr(pred)).select("doc_id", "text")

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  private def resultMap(d: DataFrame): Map[Long, Option[Long]] =
    d.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("check against a built index == direct cross-side bucket collisions") {
    val base = docs("source NOT IN ('src0','src1')")
    val fresh = docs("source IN ('src0','src1')")
    val dir = Files.createTempDirectory("graft-mh-idx").toFile
    try {
      val path = dir.getAbsolutePath + "/idx"
      MinhashIndex.build(base, path)
      val got = resultMap(MinhashIndex.check(spark, path, fresh))
      // direct model: min base doc sharing any band bucket
      val bb = Dedup.bandBuckets(base, Dedup.PERMS, Dedup.BANDS)
        .select(col("band"), col("bh"), col("doc_id").as("base_id"))
      val want = resultMap(fresh.select("doc_id").join(
        Dedup.bandBuckets(fresh, Dedup.PERMS, Dedup.BANDS)
          .join(bb, Seq("band", "bh"))
          .groupBy("doc_id").agg(min("base_id").as("candidate_of")),
        Seq("doc_id"), "left")
        .select(col("doc_id"), col("candidate_of").isNotNull, col("candidate_of")))
      assert(got == want)
      assert(got.values.exists(_.isDefined),
        "the synthetic corpus must yield at least one cross candidate")
      // every new doc reports exactly once
      assert(got.keySet == fresh.select("doc_id").collect()
        .map(_.getLong(0)).toSet)
    } finally rm(dir)
  }

  test("build(A) + append(B) answers exactly like build(A union B)") {
    val a = docs("source IN ('src2','src3','src4','src5')")
    val b = docs("source IN ('src6','src7','src8','src9')")
    val c = docs("source IN ('src0','src1')")
    val dir = Files.createTempDirectory("graft-mh-inc").toFile
    try {
      val inc = dir.getAbsolutePath + "/inc"
      val full = dir.getAbsolutePath + "/full"
      MinhashIndex.build(a, inc)
      MinhashIndex.append(b, inc)
      MinhashIndex.build(a.union(b), full)
      assert(resultMap(MinhashIndex.check(spark, inc, c)) ==
        resultMap(MinhashIndex.check(spark, full, c)))
      // an empty slice checks cleanly (zero rows, no error) — the
      // ingest loop shape must tolerate idle batches
      assert(MinhashIndex.check(spark, inc, c.limit(0)).collect().isEmpty)
    } finally rm(dir)
  }

  test("remove(x) after build(A) answers exactly like build(A minus x)") {
    val a = docs("source NOT IN ('src0','src1')")
    val gone = a.filter(col("doc_id") % 3 === 0).select("doc_id")
    val keep = a.join(gone, Seq("doc_id"), "left_anti")
    val probe = docs("source IN ('src0','src1')")
    val dir = Files.createTempDirectory("graft-mh-del").toFile
    try {
      val full = dir.getAbsolutePath + "/full"
      val rest = dir.getAbsolutePath + "/rest"
      MinhashIndex.build(a, full)
      MinhashIndex.build(keep, rest)
      MinhashIndex.remove(spark, full, gone)
      def buckets(p: String) =
        spark.read.parquet(s"$p/buckets").collect().toSet
      assert(buckets(full) == buckets(rest),
        "takedown buckets must equal the remaining-corpus build's")
      assert(resultMap(MinhashIndex.check(spark, full, probe)) ==
        resultMap(MinhashIndex.check(spark, rest, probe)))
      // idempotent; removing unknown ids is a no-op
      MinhashIndex.remove(spark, full, gone)
      assert(buckets(full) == buckets(rest))
    } finally rm(dir)
  }
}
