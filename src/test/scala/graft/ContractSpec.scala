package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself — the failure modes that would
  * silently zero a round: an oracle keyed to a renamed query (the
  * driver would report a missing-output FAIL), a non-snake name the
  * gate's path handling could mangle, or a flagship that returns no
  * rows (the driver's smoke check).
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are driver-safe lowercase snake case") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"unsafe names: $bad")
  }

  test("flagship entry smokes: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("inventory size only grows (ratchet against accidental de-registration)") {
    // update the floor when queries are ADDED; a drop below it means a
    // family map lost an entry in a refactor
    assert(SparkEntry.queries.size >= 209, s"now ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 175, s"now ${SparkEntry.oracleSql.size}")
  }
}
