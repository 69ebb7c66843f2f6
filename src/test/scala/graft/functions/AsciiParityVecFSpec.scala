package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The fused parity-vector expression must match the 32×(substring+ascii)
  * formulation it replaces term-for-term, or the SimHash oracle would
  * drift.
  */
class AsciiParityVecFSpec extends SparkTestBase {

  test("parity_vec == ascii(substring)%2*2-1 on real md5 digests") {
    AsciiParityVecF.register(spark)
    val h = Tables.documents(spark, Sf0001).limit(200)
      .select(md5(col("text")).as("h"))
      .withColumn("p", call_function("graft_parity_vec", col("h")))
    val checks = (0 until 32).map(b =>
      (element_at(col("p"), b + 1) ===
        expr(s"(ascii(substring(h, ${b + 1}, 1)) % 2) * 2 - 1")).as(s"c$b"))
    val allOk = h.select(checks.reduce(_ && _).as("ok"))
      .filter(!col("ok")).count()
    assert(allOk === 0)
    assert(h.select(size(col("p"))).distinct().head().getInt(0) === 32)
  }

  test("null in, null out; empty string gives empty array") {
    AsciiParityVecF.register(spark)
    import spark.implicits._
    val df = Seq(Option("ab3"), None, Option("")).toDF("s")
      .select(call_function("graft_parity_vec", col("s")).as("p"))
    val rows = df.collect()
    // 'a'=97 odd -> 1, 'b'=98 even -> -1, '3'=51 odd -> 1
    assert(rows(0).getSeq[Int](0) === Seq(1, -1, 1))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getSeq[Int](0) === Seq.empty)
  }
}
