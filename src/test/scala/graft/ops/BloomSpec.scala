package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Bloom semi-join prefilter: no false negatives (every true match
  * survives the prefilter), exact composition (prefilter + exact join ==
  * plain semi-join), and genuine pruning (the prefilter drops most
  * non-matching fact rows for a selective dim — the property that makes
  * it worth running at 100 TB).
  */
class BloomSpec extends SparkTestBase {

  test("prefilter + exact semi-join == plain semi-join (urgent-order lineitems)") {
    val li = Tables.lineitem(spark, Sf0001)
    val urgent = Tables.orders(spark, Sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSeq
    val pre = Bloom.prefilter(li, col("l_orderkey"), urgent, expectedNdv = 4096)
    val composed = pre.join(urgent, pre("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSeq
    assert(composed === plain)
  }

  test("no false negatives: every true match passes the prefilter") {
    val li = Tables.lineitem(spark, Sf0001)
    val urgent = Tables.orders(spark, Sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val trueMatches = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
    val pre = Bloom.prefilter(li, col("l_orderkey"), urgent, expectedNdv = 4096)
    // true matches minus prefilter survivors must be empty
    assert(trueMatches.join(pre,
      trueMatches("l_orderkey") === pre("l_orderkey") &&
        trueMatches("l_linenumber") === pre("l_linenumber"), "left_anti")
      .count() === 0L)
  }

  test("empty dim: prefilter returns zero rows (matches the empty semi-join), no analysis error") {
    val li = Tables.lineitem(spark, Sf0001)
    val none = Tables.orders(spark, Sf0001)
      .filter(col("o_orderpriority") === "NO-SUCH-PRIORITY")
      .select(col("o_orderkey"))
    assert(Bloom.prefilter(li, col("l_orderkey"), none, expectedNdv = 16).count() === 0L)
  }

  test("genuine pruning: the prefilter drops most non-matching rows") {
    val li = Tables.lineitem(spark, Sf0001)
    val urgent = Tables.orders(spark, Sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val total = li.count().toDouble
    val matched = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .count().toDouble
    val kept = Bloom.prefilter(li, col("l_orderkey"), urgent, expectedNdv = 4096)
      .count().toDouble
    // survivors = matches + false positives; with ~8 bits/key the FP rate
    // is low single digits — require survivors within 1.25x of the true
    // match count and well under the full scan
    assert(kept >= matched, "prefilter lost matches")
    assert(kept <= matched * 1.25 + 16,
      f"false-positive rate too high: kept=$kept%.0f matched=$matched%.0f")
    assert(kept < total * 0.5, "prefilter pruned nothing")
  }
}
