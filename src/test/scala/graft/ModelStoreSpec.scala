package graft

import graft.operators.ModelStore

/** Unit contract of the driver-side model store: save/load round-trip,
  * the mtime-stamped load memo (a re-save must invalidate it — serving
  * queries never see stale models), and loadOrTrain's train-once
  * behavior. Model payloads are [m][cid][dim] doubles — the sanctioned
  * driver-traffic class. */
class ModelStoreSpec extends GraftSpec {

  private def freshPath(): String =
    new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_ms").toFile,
      "model").getAbsolutePath

  private val a: Array[Array[Array[Double]]] =
    Array(Array(Array(1.0, 2.0), Array(3.0, 4.0)), Array(Array(5.0, 6.0)))
  private val b: Array[Array[Array[Double]]] =
    Array(Array(Array(9.0, 8.0), Array(7.0, 6.0)), Array(Array(5.0, 4.0)))

  private def flat(x: Array[Array[Array[Double]]]): Seq[Double] =
    x.flatten.flatten.toSeq

  test("save/load round-trips exactly; absent path loads None") {
    val p = freshPath()
    assert(ModelStore.load(spark, p).isEmpty)
    ModelStore.save(spark, p, a)
    assert(ModelStore.load(spark, p).map(flat).contains(flat(a)))
  }

  test("a re-save invalidates the load memo — readers never serve " +
      "stale models after a retrain") {
    val p = freshPath()
    ModelStore.save(spark, p, a)
    assert(ModelStore.load(spark, p).map(flat).contains(flat(a)))
    // rename-into-place refreshes the tree mtime; a same-millisecond
    // save could carry an equal stamp, so nudge the clock boundary
    Thread.sleep(5)
    ModelStore.save(spark, p, b)
    new java.io.File(p).setLastModified(System.currentTimeMillis() + 1000)
    assert(ModelStore.load(spark, p).map(flat).contains(flat(b)),
      "memo served the pre-retrain artifact")
  }

  test("loadOrTrain trains exactly once per path") {
    val p = freshPath()
    var trained = 0
    def train(): Array[Array[Array[Double]]] = { trained += 1; a }
    assert(flat(ModelStore.loadOrTrain(spark, p)(train())) == flat(a))
    assert(flat(ModelStore.loadOrTrain(spark, p)(train())) == flat(a))
    assert(trained == 1, s"trained $trained times")
  }

  test("fingerprint changes with any value change and is stable") {
    val f1 = ModelStore.fingerprint(a)
    assert(f1 == ModelStore.fingerprint(a))
    assert(f1 != ModelStore.fingerprint(b))
    val a2 = a.map(_.map(_.clone()))
    a2(0)(0)(0) = a2(0)(0)(0) + java.lang.Math.ulp(a2(0)(0)(0))
    assert(f1 != ModelStore.fingerprint(a2), "1-ulp drift not detected")
  }
}
