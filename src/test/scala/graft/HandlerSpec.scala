package graft

import graft.handler.DistributedHandler

/** Mirrors the reference's own tests
  * (`/root/reference/tests/test_distributed_handler.py`): map /
  * batched_map / stdlib results agree (order-insensitive), batch size
  * defaults to the worker count, context-manager lifecycle works.
  */
object HandlerSpec {
  // standalone lambda: Spark serializes the closure, so it must not drag
  // the (non-serializable) suite instance along
  val f: Int => Int = x => x * x
}

class HandlerSpec extends SparkSpec {
  import spark.implicits._
  import HandlerSpec.f

  private val items = (1 to 100).toList

  test("map matches stdlib map (order-insensitive)") {
    val h = DistributedHandler()
    val got = h.gather(h.map(items)(f)).sorted
    assert(got == items.map(f).sorted)
  }

  test("batchedMap matches map for any batch size") {
    val h = DistributedHandler()
    for (bs <- Seq(1, 7, 100, 1000)) {
      val got = h.gather(h.batchedMap(items, bs)(f)).sorted
      assert(got == items.map(f).sorted, s"batchSize=$bs")
    }
  }

  test("batchedMap bounds concurrent tasks by batch size") {
    val h = DistributedHandler()
    val ds = h.batchedMap(items, 25)(f)
    assert(ds.rdd.getNumPartitions == 4) // ceil(100/25)
  }

  test("gatherAll gathers futures from several map calls in one job, " +
      "in input order") {
    val h = DistributedHandler()
    val a = h.map(Seq(1, 2, 3))(_ * 10)
    val b = h.batchedMap(Seq(4, 5), 1)(_ * 10)
    val got = h.gatherAll(Seq(a, b))
    assert(got == Seq(10, 20, 30, 40, 50),
      "mixed gather must concatenate per-handle results in input order")
    intercept[IllegalArgumentException] { h.gatherAll(Seq.empty[
      org.apache.spark.sql.Dataset[Int]]) }
  }

  test("map2 zips two iterables") {
    val h = DistributedHandler()
    val got = h.gather(h.map2(items, items.map(_ * 10))(_ + _)).sorted
    assert(got == items.map(x => x + x * 10).sorted)
  }

  test("map3 and mapN zip n iterables like reference client.map(f, *its)") {
    val h = DistributedHandler()
    val (as, bs, cs) = (items, items.map(_ * 10), items.map(_ * 100))
    val expected = as.lazyZip(bs).lazyZip(cs).map(_ + _ + _).sorted
    val got3 = h.gather(h.map3(as, bs, cs)(_ + _ + _)).sorted
    assert(got3 == expected)
    val gotN = h.gather(
      h.mapN(Seq(as, bs, cs))(_.map(_.asInstanceOf[Int]).sum)).sorted
    assert(gotN == expected)
  }

  test("mapN zips heterogeneous types, truncates to the shortest") {
    val h = DistributedHandler()
    val got = h.gather(h.mapN(Seq(Seq(1, 2, 3), Seq("a", "b")))(
      xs => s"${xs(0)}${xs(1)}")).sorted
    assert(got == Seq("1a", "2b"))
  }

  test("batchedMapN matches mapN and bounds tasks") {
    val h = DistributedHandler()
    val ds = h.batchedMapN(Seq(items, items), 25)(
      xs => xs.map(_.asInstanceOf[Int]).sum)
    assert(ds.rdd.getNumPartitions == 4) // ceil(100/25)
    assert(h.gather(ds).sorted == items.map(_ * 2).sorted)
  }

  test("defaultBatchSize is the cluster parallelism") {
    val h = DistributedHandler()
    assert(h.defaultBatchSize == spark.sparkContext.defaultParallelism)
  }

  test("explicit master reuses a matching session, rejects a mismatch") {
    val h = DistributedHandler(Some(spark.sparkContext.master))
    assert(h.spark eq spark)
    h.close()
    assert(!spark.sparkContext.isStopped)
    intercept[IllegalStateException] {
      DistributedHandler(Some("spark://elsewhere:7077"))
    }
  }

  test("withHandler context manager closes without stopping the session") {
    val res = DistributedHandler.withHandler() { h =>
      h.gather(h.map(List(1, 2, 3))(_ + 1)).sorted
    }
    assert(res == List(2, 3, 4))
    assert(!spark.sparkContext.isStopped)
  }
}
