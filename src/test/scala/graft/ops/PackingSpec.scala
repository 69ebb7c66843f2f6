package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Sequence packing (ops.Packing): the two-phase distributed prefix sum
  * must equal the sequential definition exactly, regardless of incoming
  * partitioning, and handle the straddle/degenerate cases a real corpus
  * throws at it. The 100 TB property (no single-partition global window)
  * is pinned in PlanAuditSpec.
  */
class PackingSpec extends SparkTestBase {

  private def sequential(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, tok) =>
      val r = (id, tok, acc / budget, acc % budget)
      acc += tok
      r
    }
  }

  private def collectPacked(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("packSequences equals the sequential prefix-sum definition") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, 1L + (i * 7) % 40))
    val df = rows.toDF("doc_id", "n")
    val got = collectPacked(
      Packing.packSequences(df, "doc_id", col("n"), budget = 128L))
    assert(got === sequential(rows, 128L))
  }

  test("output is invariant to the incoming partitioning") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, 1L + (i * 13) % 25))
    val base = rows.toDF("doc_id", "n")
    val a = collectPacked(Packing.packSequences(
      base.repartition(1), "doc_id", col("n"), 64L))
    val b = collectPacked(Packing.packSequences(
      base.repartition(7, col("n")), "doc_id", col("n"), 64L))
    val c = collectPacked(Packing.packSequences(
      base.orderBy(desc("doc_id")), "doc_id", col("n"), 64L))
    assert(a === b)
    assert(a === c)
    assert(a === sequential(rows, 64L))
  }

  test("documents larger than the budget straddle: seq_id jumps, offsets stay exact") {
    import spark.implicits._
    // doc 1 is 5x the budget — docs 2.. must land 5 sequences later
    val rows = Seq((0L, 10L), (1L, 160L), (2L, 10L), (3L, 40L))
    val got = collectPacked(Packing.packSequences(
      rows.toDF("doc_id", "n"), "doc_id", col("n"), 32L))
    assert(got === sequential(rows, 32L))
    // spot the semantics: doc 2 starts at absolute token 170 -> seq 5
    assert(got(2) === ((2L, 10L, 5L, 10L)))
  }

  test("degenerate inputs: empty frame and single row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(Packing.packSequences(empty, "doc_id", col("n"), 8L).count() === 0L)
    val one = Seq((42L, 3L)).toDF("doc_id", "n")
    assert(collectPacked(Packing.packSequences(one, "doc_id", col("n"), 8L)) ===
      Seq((42L, 3L, 0L, 0L)))
  }

  test("null token counts contribute zero and keep their stamp") {
    import spark.implicits._
    // a contiguous id run of null counts can fill a whole range partition
    // (sum(n_tok) NULL there) — the prefix must treat them as 0 tokens
    val rows = (0L until 40L).map(i =>
      (i, if (i >= 10 && i < 30) None else Some(5L)))
    val df = rows.toDF("doc_id", "n")
    val got = Packing.packSequences(df, "doc_id", col("n"), budget = 16L)
      .orderBy("doc_id").collect()
    assert(got.length === 40)
    var acc = 0L
    rows.foreach { case (id, n) =>
      val r = got(id.toInt)
      assert(r.getLong(2) === acc / 16 && r.getLong(3) === acc % 16,
        s"doc $id: got (${r.getLong(2)}, ${r.getLong(3)}), want (${acc / 16}, ${acc % 16})")
      assert(r.isNullAt(1) === n.isEmpty)
      acc += n.getOrElse(0L)
    }
  }

  test("real corpus: totals line up with the token sum") {
    val docs = Tables.documents(spark, Sf0001)
    val packed = Packing.packSequences(docs, "doc_id",
      TextOps.tokenCount(col("text")), budget = 256L)
    val n = docs.count()
    assert(packed.count() === n)
    // the last document's cum_before + its tokens == the corpus token sum
    val total = packed.agg(sum("n_tok")).head().getLong(0)
    val last = packed.orderBy(desc("doc_id")).limit(1)
      .select(col("seq_id") * 256L + col("seq_offset") + col("n_tok"))
      .head().getLong(0)
    assert(last === total)
  }
}
