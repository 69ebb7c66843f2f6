package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference does both exact-key dedup (node dedup by rounded coords,
  * `GenerateColumnar.py:145-152`) and approximate dedup (face-centroid
  * distance < 1e-6 via an O(n²) scan, `BooleanOperation.py:85-95`). We keep
  * the semantics but replace the O(n²) scan with a cell-binned band join —
  * the same trick the reference engine uses for neighbor search (`CellSize`
  * grid, `UniaxialCompressionTest/MLS00con.dat:2`) — so it shuffles on bin
  * keys and scales linearly in candidate pairs instead of quadratically in
  * rows.
  *
  * The MinHash/LSH and fingerprint family are the training-data-pipeline
  * extensions (north star): document near-dedup at 100 TB must never compare
  * all pairs, so candidates come from band-bucket equi-joins.
  */
object Dedup {

  /** DD1 — exact dedup by derived key: keep the lowest id per key group.
    * Mirrors `GenerateColumnar.py:145-152` (6-dp rounded node keys →
    * stable ids). One hash-aggregate, map-side partials, shuffles on key.
    */
  def exactDedupByKey(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** DD2 — all pairs (id_a < id_b) with |v_a - v_b| < eps, via cell binning.
    * Each row lands in bin floor(v/eps); a pair within eps spans at most
    * adjacent bins, so probing bins {b-1, b, b+1} on one side of an
    * equi-join finds every pair exactly once (the build side keeps its
    * single home bin). Equi-join on the bin key → shuffle-hash/SMJ, AQE
    * handles skewed bins; no O(n²) cross product.
    */
  def bandPairs(df: DataFrame, idCol: String, valCol: String, eps: Double): DataFrame = {
    val base = df.select(col(idCol).as("id_a"), col(valCol).as("v_a"))
      .withColumn("bin", floor(col("v_a") / eps).cast("long"))
    val probes = base.withColumn(
      "pbin", explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
    val build = df.select(col(idCol).as("id_b"), col(valCol).as("v_b"))
      .withColumn("bin_b", floor(col("v_b") / eps).cast("long"))
    probes.join(build,
        col("pbin") === col("bin_b") &&
        col("id_a") < col("id_b") &&
        abs(col("v_a") - col("v_b")) < eps)
      .select(col("id_a"), col("id_b"))
  }

  /** Word n-gram shingles: one output row per (doc, shingle position).
    * Input rows need a text column; rows with fewer than n tokens drop out
    * (mirrors the reference's skip-invalid-row policy,
    * `BooleanOperation.py:60-61`).
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("tokens"))
      .filter(size(col("tokens")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(tokens) - ${n - 1}), i -> concat_ws(' ', slice(tokens, i, $n)))"
        )).as("shingle"))

  /** MinHash signatures over word shingles: ONE md5 per shingle, split into
    * four 8-hex-char (32-bit) chunks that act as the independent hash
    * functions; each signature component is the lexicographic min of its
    * chunk over the doc's shingle set. All 4 mins are computed in ONE
    * aggregation pass over the exploded shingle table (map-side combined)
    * — hashing is the hot path at corpus scale, so 1 digest beats 4.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 4): DataFrame = {
    val sh = wordShingles(docs, idCol, textCol, shingleN)
      .withColumn("h", md5(col("shingle")))
    val aggs = (0 until numHashes).map(s =>
      min(substring(col("h"), s * 8 + 1, 8)).as(s"mh$s"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over the 4-component MinHash signature: 2 bands × 2 rows.
    * Docs sharing any band hash become candidate near-duplicate pairs.
    * The pair generation is an equi-join on the band key — never all-pairs.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol)
    val banded = sig.select(col("doc_id"),
      explode(array(
        md5(concat(lit("b0|"), col("mh0"), col("mh1"))),
        md5(concat(lit("b1|"), col("mh2"), col("mh3"))))).as("band"))
    val other = banded.select(col("doc_id").as("doc_b"), col("band").as("band_b"))
    banded.join(other, col("band") === col("band_b") && col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
  }
}
