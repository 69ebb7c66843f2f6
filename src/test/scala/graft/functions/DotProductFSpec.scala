package graft.functions

import graft.{SparkTestBase, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The fused dot-product expression must be BIT-IDENTICAL to the
  * zip_with+aggregate fold it replaces (same accumulation order), or the
  * DuckDB oracle comparison would drift.
  */
class DotProductFSpec extends SparkTestBase {

  test("dot_f == fold dot on every fixture embedding pair (bit-exact)") {
    DotProductF.register(spark)
    val e = Tables.embeddings(spark, Sf0001).limit(50)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b)
      .select(col("id_a"), col("id_b"),
        expr("graft_dot_f(ea, eb)").as("fused"),
        Similarity.dotD(col("ea"), col("eb")).as("folded"))
    assert(pairs.filter(col("fused") =!= col("folded")).count() === 0)
    assert(pairs.count() === 2500)
  }

  test("null input yields null; length mismatch folds the common prefix") {
    DotProductF.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 9.0f))), // prefix: 1*3+2*4
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f)), None))
      .toDF("a", "b")
    val got = df.select(expr("graft_dot_f(a, b)")).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("rejects non-float arrays at analysis time") {
    DotProductF.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(expr("graft_dot_f(a, b)")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("dot_f") ||
      ex.getMessage.toLowerCase.contains("datatype"))
  }
}
