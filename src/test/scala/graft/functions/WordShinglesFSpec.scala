package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The generated shingling loop must equal the lambda form it replaced,
  * string-for-string, or the MinHash/Jaccard oracles would drift.
  */
class WordShinglesFSpec extends SparkTestBase {

  test("shingles == transform/slice/concat_ws lambda on real documents") {
    val t = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tokens"))
    for (n <- Seq(2, 3, 5)) {
      val mismatch = t
        .select(col("doc_id"),
          WordShinglesF.shingles(spark, col("tokens"), n).as("fused"),
          expr(s"transform(sequence(1, greatest(size(tokens) - ${n - 1}, 0)), " +
            s"i -> concat_ws(' ', slice(tokens, i, $n)))").as("lambda"))
        .filter(col("fused") =!= col("lambda"))
        .count()
      assert(mismatch === 0, s"n=$n diverged")
    }
  }

  test("non-positive n rejected at analysis time (SQL surface is user-reachable)") {
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c")).toDF("tokens")
    for (n <- Seq(0, -1)) {
      val ex = intercept[Exception] {
        df.select(WordShinglesF.shingles(spark, col("tokens"), n)).collect()
      }
      assert(ex.getMessage.contains("n >= 1"), s"n=$n: ${ex.getMessage}")
    }
  }

  test("short inputs give empty arrays; null in, null out") {
    import spark.implicits._
    val df = Seq(Some(Seq("a", "b")), Some(Seq("only")), Some(Seq.empty[String]), None)
      .toDF("tokens")
      .select(WordShinglesF.shingles(spark, col("tokens"), 3).as("s"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq.empty)
    assert(rows(1).getSeq[String](0) === Seq.empty)
    assert(rows(2).getSeq[String](0) === Seq.empty)
    assert(rows(3).isNullAt(0))
    // and the basic positive case
    val got = Seq(Seq("w", "x", "y", "z")).toDF("tokens")
      .select(WordShinglesF.shingles(spark, col("tokens"), 3).as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("w x y", "x y z"))
  }
}
