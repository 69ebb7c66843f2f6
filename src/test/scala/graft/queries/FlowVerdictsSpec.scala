package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The r18 verdict's #2 done-criterion: the three no-oracle flow keys
  * now carry in-query integer self-verdicts, and a PLANTED regression
  * must flip the column (the local gate, `tools/check.py`, fails any
  * no-oracle key whose `*_ok` column is not all-1). These tests drive
  * the exact expressions the keys emit ([[Verdicts]]) — first the
  * planted failures, then a real flow whose store is tampered.
  */
class FlowVerdictsSpec extends SparkTestBase {

  test("dup_cos_ok: an unverified (below-threshold) drop, a forged exact dup, and a missing input each read 0; honest rows read 1") {
    import spark.implicits._
    val e1 = Seq(1.0f, 0.0f)
    val e2 = Seq(0.9999f, 0.0141f) // cos ~0.9999 vs e1
    val far = Seq(0.0f, 1.0f)      // cos 0 vs e1
    val rows = Seq(
      // honest verified near-dup
      (1L, "neardup_batch", Option(e1), Option(e2)),
      // PLANTED: a drop recorded without a passing cosine (the skipped-
      // verification regression — candidate banding alone said dup)
      (2L, "neardup_batch", Option(e1), Option(far)),
      // honest exact dup (byte-equal)
      (3L, "exact_batch", Option(e1), Option(e1)),
      // PLANTED: an exact status over non-identical vectors
      (4L, "exact_batch", Option(e1), Option(e2)),
      // PLANTED: a checked status whose inputs can't be found — must
      // read 0, never a silent pass
      (5L, "neardup_batch", Option(e1), Option.empty[Seq[Float]]),
      // kept rows are vacuously 1
      (6L, "kept", Option(e1), Option.empty[Seq[Float]]))
      .toDF("vec_id", "status", "__e", "__m")
      .withColumn("__e", col("__e").cast("array<float>"))
      .withColumn("__m", col("__m").cast("array<float>"))
    val got = rows.withColumn("v", Verdicts.dupCosOkCol(
        Seq("exact_batch"), Seq("neardup_batch"), 0.99))
      .select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 0,
      6L -> 1))
  }

  test("store_ok: a lost kept row and a leaked dropped row each flip exactly their decision row") {
    import spark.implicits._
    val dec = Seq((1L, "kept", Option(true)), // kept and stored: 1
      (2L, "kept", Option.empty[Boolean]),    // PLANTED: kept, lost: 0
      (3L, "neardup_batch", Option.empty[Boolean]), // dropped, absent: 1
      (4L, "neardup_batch", Option(true)))    // PLANTED: dropped, leaked: 0
      .toDF("vec_id", "status", "__stored")
    val got = dec.withColumn("v",
        Verdicts.storeOkCol(col("status") === "kept"))
      .select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("pack_ok: canonical packing reads all-1; a gap, a collision, and an out-of-range offset each flip") {
    import spark.implicits._
    def packOf(rows: Seq[(Long, Long, Long, Long)], start: Long = 0L) =
      Verdicts.withPackOk(
          rows.toDF("doc_id", "n_tok", "seq_id", "seq_offset"), "doc_id",
          16L, start)
        .select("doc_id", "pack_ok")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // canonical gap-free layout under budget 16: tokens 5,7,6,4 at
    // global cursors 0,5,12,18
    val good = Seq((1L, 5L, 0L, 0L), (2L, 7L, 0L, 5L), (3L, 6L, 0L, 12L),
      (4L, 4L, 1L, 2L))
    assert(packOf(good).values.forall(_ == 1), s"canonical: ${packOf(good)}")
    // PLANTED gap: doc 2 shifted one slot late — it AND every later row
    // fall off the prefix sum
    val gap = Seq((1L, 5L, 0L, 0L), (2L, 7L, 0L, 6L), (3L, 6L, 0L, 13L),
      (4L, 4L, 1L, 3L))
    assert(packOf(gap)(2L) === 0)
    // PLANTED collision: docs 2 and 3 packed onto the same slot
    val coll = Seq((1L, 5L, 0L, 0L), (2L, 7L, 0L, 5L), (3L, 6L, 0L, 5L),
      (4L, 4L, 1L, 2L))
    assert(packOf(coll).values.exists(_ == 0))
    // PLANTED out-of-range offset
    val oob = Seq((1L, 5L, 0L, 0L), (2L, 7L, 1L, -5L))
    assert(packOf(oob)(2L) === 0)
    // a carried start cursor: same layout shifted by 32
    val carried = Seq((1L, 5L, 2L, 0L), (2L, 7L, 2L, 5L))
    assert(packOf(carried, start = 32L).values.forall(_ == 1))
    // dropped rows (null pack fields) are vacuously 1
    val withNull = Verdicts.withPackOk(
        Seq((1L, 5L, 0L, 0L)).toDF("doc_id", "n_tok", "seq_id",
          "seq_offset")
        .unionByName(Seq(2L).toDF("doc_id")
          .withColumn("n_tok", lit(null).cast("long"))
          .withColumn("seq_id", lit(null).cast("long"))
          .withColumn("seq_offset", lit(null).cast("long"))), "doc_id", 16L)
      .select("doc_id", "pack_ok")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(withNull === Map(1L -> 1, 2L -> 1))
    // the distributed two-phase check is partitioning-invariant: the
    // same canonical layout over many range partitions still reads
    // all-1 (partition-boundary links close through the driver bases)
    val many = (0L until 400L).map(i => (i, 3L, (i * 3) / 16, (i * 3) % 16))
    assert(packOf(many).values.forall(_ == 1))
    val manyGap = many.map { case (id, t, s, o) =>
      if (id == 200L) (id, t, s, o + 1) else (id, t, s, o) }
    val g2 = packOf(manyGap)
    assert(g2(200L) === 0 && g2.count(_._2 == 0) <= 2,
      "a mid-corpus shifted row flips locally, not globally")
  }

  test("end to end: a real vector flow's verdicts are all-1; tampering the store flips exactly the tampered rows") {
    import spark.implicits._
    def rot(a: Double): Seq[Float] = {
      val v = Array.fill(8)(0f)
      v(0) = math.cos(a).toFloat; v(1) = math.sin(a).toFloat; v.toSeq
    }
    def vdf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    val p = graft.ops.VectorFlow.Params(minCos = 0.99, dim = 8)
    val dir = java.nio.file.Files.createTempDirectory("fverd").toString
    // wave 1: 6 well-separated keeps; wave 2: one exact copy (+100) and
    // one near copy (+200) of wave-1 keeps, plus 2 fresh
    val w1in = (0 until 6).map(i => (10L + i) -> rot(0.3 * i))
    val w2in = Seq(110L -> rot(0.0), 210L -> rot(0.002),
      30L -> rot(3.0), 31L -> rot(3.3))
    val r1 = graft.ops.VectorFlow.ingest(dir, vdf(w1in), 0L, p)
    val r2 = graft.ops.VectorFlow.ingest(dir, vdf(w2in), r1.cursor, p)
    val dec = r1.decisions.unionByName(r2.decisions)
    val allIn = vdf(w1in ++ w2in)
    def verdicts(storePath: String) = dec
      .join(allIn.select(col("vec_id"), col("embedding").as("__e")),
        Seq("vec_id"), "left")
      .join(allIn.select(col("vec_id").as("matched_id"),
        col("embedding").as("__m")), Seq("matched_id"), "left")
      .join(Verdicts.storedFlag(spark, storePath, "vec_id"),
        Seq("vec_id"), "left")
      .withColumn("dup_cos_ok", Verdicts.dupCosOkCol(
        Seq("exact_history", "exact_batch"),
        Seq("neardup_history", "neardup_batch"), p.minCos))
      .withColumn("store_ok", Verdicts.storeOkCol(col("status") === "kept"))
      .select("vec_id", "status", "dup_cos_ok", "store_ok")
    val base = verdicts(s"$dir/vectors").collect()
    assert(base.forall(r => r.getInt(2) == 1 && r.getInt(3) == 1),
      s"an honest flow must verdict all-1: ${base.mkString(", ")}")
    assert(base.exists(_.getString(1) == "exact_history") &&
      base.exists(_.getString(1) == "neardup_history"),
      "precondition: the planted copies exercised both drop classes")
    // TAMPER: rewrite the store losing kept id 30 and leaking dropped
    // id 110 — exactly those two decision rows must flip
    val tampered = java.nio.file.Files
      .createTempDirectory("fverd_t").toString + "/vectors"
    spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id") =!= 30L)
      .select("vec_id").distinct()
      .unionByName(Seq(110L).toDF("vec_id"))
      .write.parquet(tampered)
    val got = verdicts(tampered).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got(30L) === 0, "the lost kept row must flip store_ok")
    assert(got(110L) === 0, "the leaked dropped row must flip store_ok")
    assert(got.count(_._2 == 0) === 2, s"only the tampered rows flip: $got")
  }
}
