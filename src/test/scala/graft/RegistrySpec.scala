package graft

/** Driver-contract smoke: every registered query runs at sf0.001; the
  * flagship entry returns rows; oracle keys reference real queries. */
class RegistrySpec extends GraftSpec {

  test("registry names are unique and oracle keys are a subset") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    // oracle'd queries follow the q_ naming; streaming no-oracle ones n_
    val noOracle = names -- SparkEntry.oracleSql.keySet
    assert(noOracle.forall(_.startsWith("n_")), s"unexpected no-oracle: $noOracle")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfTiny).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
