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

  // ---- r20 (the r19 verdict's #1): the four formerly-rows-only keys'
  // verdict expressions, each with planted regressions ----

  private def rot8(a: Double): Seq[Float] = {
    val v = Array.fill(8)(0f)
    v(0) = math.cos(a).toFloat; v(1) = math.sin(a).toFloat; v.toSeq
  }
  private def embOf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("withSemanticVerdicts (min-id): honest rows read all-1; a forged evidence-less dup, a wrong keeper, a missing self-row, and an is_dup lie each flip") {
    import spark.implicits._
    // ids 1, 2 a true near-dup pair (cos ~1); id 3 far from both
    val emb = embOf(Seq(1L -> rot8(0.0), 2L -> rot8(0.002),
      3L -> rot8(1.5)))
    def verdictsOf(rows: Seq[(Long, Long, Long, Int)]) =
      Verdicts.withSemanticVerdicts(
          rows.toDF("vec_id", "cell", "canonical", "is_dup"),
          emb, minCos = 0.99, centroids = None)
        .select("vec_id", "cos_ok", "keeper_ok").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val honest = verdictsOf(Seq((1L, 0L, 1L, 0), (2L, 0L, 1L, 1),
      (3L, 0L, 3L, 0)))
    assert(honest.values.forall(_ == ((1, 1))), s"honest: $honest")
    // PLANTED forged dup: 3 claimed into 1's group with no >=minCos
    // neighbor anywhere in its cell — cos_ok flips on exactly row 3
    val forged = verdictsOf(Seq((1L, 0L, 1L, 0), (2L, 0L, 1L, 1),
      (3L, 0L, 1L, 1)))
    assert(forged(3L)._1 === 0 && forged(1L)._1 === 1 &&
      forged(2L)._1 === 1, s"forged: $forged")
    // PLANTED wrong keeper under KeepMinId: the group canonicalized to
    // 2, not its min id 1 — keeper_ok flips for the whole group
    val wrongKeeper = verdictsOf(Seq((1L, 0L, 2L, 1), (2L, 0L, 2L, 0),
      (3L, 0L, 3L, 0)))
    assert(wrongKeeper(1L)._2 === 0 && wrongKeeper(2L)._2 === 0 &&
      wrongKeeper(3L)._2 === 1, s"wrongKeeper: $wrongKeeper")
    // PLANTED missing self-row: 2 maps to canonical 1 but 1's own row
    // was dropped from the output — the keeper can't be verified
    // present, keeper_ok flips
    val noSelf = verdictsOf(Seq((2L, 0L, 1L, 1), (3L, 0L, 3L, 0)))
    assert(noSelf(2L)._2 === 0, s"noSelf: $noSelf")
    // PLANTED is_dup lie: 2 in 1's group flagged is_dup=0
    val lie = verdictsOf(Seq((1L, 0L, 1L, 0), (2L, 0L, 1L, 0),
      (3L, 0L, 3L, 0)))
    assert(lie(2L)._2 === 0, s"lie: $lie")
  }

  test("withSemanticVerdicts (far-from-centroid): the keeper must be the group's centroid-cosine argmin; picking the near one flips") {
    import spark.implicits._
    // centroid along angle 0; 21 is FARTHER from it than 20 — the
    // SemDeDup rule keeps 21. The pair itself is close (cos(0.298))
    val emb = embOf(Seq(20L -> rot8(0.002), 21L -> rot8(0.3)))
    val cent = Seq((0L, rot8(0.0))).toDF("cell", "centroid")
      .withColumn("centroid", col("centroid").cast("array<float>"))
    def verdictsOf(rows: Seq[(Long, Long, Long, Int)]) =
      Verdicts.withSemanticVerdicts(
          rows.toDF("vec_id", "cell", "canonical", "is_dup"),
          emb, minCos = 0.9, centroids = Some(cent))
        .select("vec_id", "cos_ok", "keeper_ok").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val honest = verdictsOf(Seq((20L, 0L, 21L, 1), (21L, 0L, 21L, 0)))
    assert(honest.values.forall(_ == ((1, 1))), s"honest: $honest")
    // PLANTED: keeping the near-centroid member (min id would pick it
    // too — exactly the regression a silently-swapped keeper rule makes)
    val near = verdictsOf(Seq((20L, 0L, 20L, 0), (21L, 0L, 20L, 1)))
    assert(near(20L)._2 === 0 && near(21L)._2 === 0, s"near: $near")
  }

  test("withPairCosOk: an honest pair reads 1; a doctored cos_sim, a cross-block pair, a reversed orientation, and an unknown id each read 0") {
    import spark.implicits._
    val emb = embOf(Seq(1L -> rot8(0.0), 2L -> rot8(0.002),
      3L -> rot8(1.5)))
      .withColumn("label", when(col("vec_id") === 3L, "B").otherwise("A"))
    val trueSim = BigDecimal(math.cos(0.002))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def okOf(rows: Seq[(String, Long, Long, Double)]) =
      Verdicts.withPairCosOk(
          rows.toDF("label", "id_a", "id_b", "cos_sim"), emb, "label")
        .select("id_a", "pair_ok").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(okOf(Seq(("A", 1L, 2L, trueSim)))(1L) === 1)
    // PLANTED: a cos_sim the raw embeddings don't reproduce
    assert(okOf(Seq(("A", 1L, 2L, 0.5)))(1L) === 0)
    // PLANTED: a pair leaked across blocks (3 is labeled B)
    assert(okOf(Seq(("A", 1L, 3L,
      BigDecimal(math.cos(1.5)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))(1L) === 0)
    // PLANTED: reversed orientation
    assert(okOf(Seq(("A", 2L, 1L, trueSim)))(2L) === 0)
    // PLANTED: an id not in the input — 0, never a silent pass
    assert(okOf(Seq(("A", 1L, 99L, trueSim)))(1L) === 0)
  }

  test("withPairSetOk: a bogus emitted pair flips its own row; a missing expected pair flips complete_ok on every row") {
    import spark.implicits._
    val expected = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    def run(rows: Seq[(Long, Long)]) =
      Verdicts.withPairSetOk(rows.toDF("doc_a", "doc_b"), expected,
          "doc_a", "doc_b")
        .select("doc_a", "pair_ok", "complete_ok").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val exact = run(Seq((1L, 2L), (3L, 4L)))
    assert(exact.forall(t => t._2 == 1 && t._3 == 1), s"exact: ${exact.toSeq}")
    // PLANTED bogus pair (a corrupted store emitting a candidate the
    // direct recompute never generates)
    val bogus = run(Seq((1L, 2L), (5L, 6L), (3L, 4L)))
    assert(bogus.find(_._1 == 5L).get._2 === 0)
    assert(bogus.filter(_._1 != 5L).forall(_._2 == 1))
    assert(bogus.forall(_._3 == 1), "nothing expected is missing here")
    // PLANTED lost pair: (3,4) vanished — no row of its own to flip,
    // so the completeness scalar flips EVERY row
    val lost = run(Seq((1L, 2L)))
    assert(lost.forall(t => t._2 == 1 && t._3 == 0), s"lost: ${lost.toSeq}")
  }

  test("withPackOk extraKeys: a doc corrected in BOTH passes keeps its no-pack row vacuously 1 while the packed row's planted gap still flips (r19 ADVICE)") {
    import spark.implicits._
    def rows(textOffsetOfDoc1: Long) = Seq(
      // doc 1, embedding pass: NO pack fields — must stay vacuous 1
      (1L, "embedding", Option.empty[Long], Option.empty[Long],
        Option.empty[Long]),
      // doc 1, text pass: packed
      (1L, "text", Option(5L), Option(0L), Option(textOffsetOfDoc1)),
      (2L, "text", Option(7L), Option(0L), Option(5L)))
      .toDF("doc_id", "pass", "n_tok", "seq_id", "seq_offset")
    def okOf(df: org.apache.spark.sql.DataFrame) =
      Verdicts.withPackOk(df, "doc_id", 16L, extraKeys = Seq("pass"))
        .select("doc_id", "pass", "pack_ok").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    val honest = okOf(rows(0L))
    assert(honest.values.forall(_ == 1), s"honest: $honest")
    // PLANTED gap on doc 1's TEXT row: with the (doc_id, pass) join the
    // flip lands on exactly that row; the embedding-pass row stays 1
    // (the r19 defect: joined on doc_id alone, it inherited the flip)
    val gap = okOf(rows(1L))
    assert(gap((1L, "text")) === 0, s"gap: $gap")
    assert(gap((1L, "embedding")) === 1,
      "the no-pack pass row must stay vacuously 1")
  }

  test("argmaxPairAfter: reproduces the recount trainer's pick per rank; a swapped merge order fails the verdict") {
    import spark.implicits._
    // "a b" dominates (4 pairs), then after its merge "a+b c" dominates
    val docs = Seq(
      (1L, "a b c x a b c y"),
      (2L, "a b c z a b q")).toDF("doc_id", "text")
    val (merges, _) = graft.ops.TextOps.trainPhraseMergesRecount(
      docs, "doc_id", "text", nMerges = 2)
    assert(merges.size === 2)
    // the verdict the key computes: rank r's merge == the full-corpus
    // argmax under the preceding prefix, count >= 2
    merges.indices.foreach { i =>
      val got = graft.ops.TextOps.argmaxPairAfter(docs, "doc_id", "text",
        merges.take(i))
      assert(got.exists { case (a, b, n) =>
        n >= 2L && (a, b) == merges(i) },
        s"rank ${i + 1}: expected ${merges(i)}, argmax said $got")
    }
    // PLANTED: the merge list in the WRONG order (rank 2 first) — the
    // rank-1 verdict must fail
    val swapped = merges.reverse
    val got = graft.ops.TextOps.argmaxPairAfter(docs, "doc_id", "text",
      Nil)
    assert(!got.exists { case (a, b, n) =>
      n >= 2L && (a, b) == swapped.head },
      "a swapped merge table must not verify as the argmax")
  }
}
