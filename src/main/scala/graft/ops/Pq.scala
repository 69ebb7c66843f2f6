package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the deep end of the compression ladder
  * (float32 → SQ8 4× → PQ 4·dsub× per byte): the vector splits into
  * `m = dim/dsub` subvectors, each replaced by the index of its nearest
  * entry in a per-subspace 256-entry codebook. 8 bytes per 64-dim vector
  * at m=8 — 32× smaller raw — with search served by asymmetric distance
  * computation: the probe precomputes one m×256 lookup table and every
  * corpus row scores in `m` array reads ([[graft.functions.PqAdcF]]),
  * never decoding.
  *
  * Scale shape: codebooks are dimension-bounded (m·256·dsub = 256·dim
  * floats — driver-held, shipped as expression literals like IVF
  * centroids); training is per-subspace Lloyd where each round is ONE
  * corpus pass (codegen argmin assign, zero shuffle) + ONE map-combined
  * aggregation (the same [[graft.functions.VecMeanAgg]] discipline as IVF
  * build) + a dimension-bounded collect; encoding is a pure narrow pass.
  * Nothing anywhere is corpus-quadratic or corpus-collected.
  */
object Pq {

  /** Flat `[m][k][dsub]` codebook. `k` is padded to the full 256 by
    * repeating entry 0 when training saw fewer distinct cells — padded
    * duplicates can never win the strict-< argmin, so codes are unaffected.
    */
  final case class PqModel(m: Int, dsub: Int, k: Int, codebook: Array[Float]) {
    def dim: Int = m * dsub
  }

  private def registered(df: DataFrame): Unit =
    graft.functions.PqF.register(df.sparkSession)

  /** Train per-subspace codebooks by Lloyd iteration. `maxTrainRows`
    * bounds the training sample with the same seeded hash-threshold
    * filter as IVF build (a map pass, no shuffle, deterministic).
    */
  def fit(emb: DataFrame, m: Int, iters: Int = 2, seed: Long = 42L,
          embCol: String = "embedding", dim: Int = -1,
          maxTrainRows: Long = 1L << 18): PqModel = {
    registered(emb)
    val d = if (dim > 0) dim
            else emb.select(size(col(embCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val ds = d / m
    val K = 256
    // bounded deterministic training sample — the same seeded
    // hash-threshold map pass as IVF build, sized off the partition-
    // sampled approxCount (no full count job)
    val base = emb.select(col("vec_id"), col(embCol).as("emb"))
    val n = IvfIndex.approxCount(emb)
    val sampled =
      if (n <= maxTrainRows) base
      else {
        val den = 1L << 20
        val num = math.min(den, math.max(1L, (maxTrainRows * den) / n * 5 / 4))
        base.filter(pmod(xxhash64(col("vec_id"), lit(seed)), lit(den)) < lit(num))
      }
    val sample =
      (if (sampled.take(1).isEmpty) base else sampled).localCheckpoint()
    // deterministic init: seeded-hash-ranked sample rows, up to K of them
    val initVecs = sample
      .withColumn("__r", xxhash64(col("vec_id"), lit(seed)))
      .orderBy("__r").limit(K)
      .select("emb")
      .collect().map(_.getSeq[Float](0).toArray)
    val kEff = initVecs.length
    require(kEff > 0, "empty training corpus")
    // cb(i)(c) = centroid of subspace i, code c
    var cb: Array[Array[Array[Float]]] =
      Array.tabulate(m)(i => initVecs.map(v => v.slice(i * ds, (i + 1) * ds)))

    def flatOf(b: Array[Array[Array[Float]]]): Array[Float] =
      b.flatMap(_.flatten)

    val vecMean = udaf(graft.functions.VecMeanAgg)
    for (_ <- 0 until iters) {
      val flat = flatOf(cb)
      // ONE pass: codes for every subspace at once, then one exploded
      // aggregation keyed (subspace, code) — the shuffle carries only
      // dimension-bounded partial sums (map-side combined)
      val updated = sample
        .withColumn("codes", call_function("graft_pq_codes", col("emb"),
          typedlit(flat), lit(ds)))
        .select(col("emb"), posexplode(col("codes")).as(Seq("sub", "code")))
        .select(col("sub"), col("code"),
          slice(col("emb"), col("sub") * lit(ds) + lit(1), lit(ds)).as("subvec"))
        .groupBy("sub", "code").agg(vecMean(col("subvec")).as("mean"))
        .collect()
      updated.foreach { r =>
        val sub = r.getInt(0); val code = r.getInt(1)
        val mean = r.getSeq[Float](2).toArray
        if (mean.nonEmpty) cb(sub)(code) = mean
        // empty cells keep their previous entry (standard Lloyd practice)
      }
    }
    // pad every subspace to the full K with entry-0 copies (never chosen:
    // strict-< argmin keeps the first of any tie)
    val padded = cb.map { sub =>
      if (sub.length >= K) sub
      else sub ++ Array.fill(K - sub.length)(sub(0).clone())
    }
    PqModel(m, ds, K, flatOf(padded))
  }

  /** The corpus with `embedding` replaced by its `m`-byte PQ codes. */
  def encodeCorpus(emb: DataFrame, model: PqModel,
                   embCol: String = "embedding"): DataFrame = {
    registered(emb)
    emb.withColumn("pq_codes", call_function("graft_pq_encode", col(embCol),
        typedlit(model.codebook), lit(model.dsub)))
      .drop(embCol)
  }

  /** Column expression: reconstruct an `array<float>` from PQ codes —
    * the generic decode that lets a PQ-coded table feed any float-vector
    * kernel (the IVF load path uses it; ADC is the faster serving form).
    */
  def pqDecode(df: DataFrame, codesCol: org.apache.spark.sql.Column,
               model: PqModel): org.apache.spark.sql.Column = {
    registered(df)
    call_function("graft_pq_decode", codesCol, typedlit(model.codebook),
      lit(model.dsub))
  }

  /** The probe's ADC lookup table: `lut[i][c] = dot(probe_sub_i,
    * codebook[i][c])`, so `Σ_i lut[i][codes_i] = dot(probe,
    * reconstruct(codes))`. m×256 doubles — probe-bounded, built on the
    * driver.
    */
  def adcLut(model: PqModel, probe: Array[Float]): Array[Double] = {
    require(probe.length == model.dim,
      s"probe dim ${probe.length} != model dim ${model.dim}")
    val lut = new Array[Double](model.m * model.k)
    var i = 0
    while (i < model.m) {
      var c = 0
      while (c < model.k) {
        val off = (i * model.k + c) * model.dsub
        var acc = 0.0
        var j = 0
        while (j < model.dsub) {
          acc += probe(i * model.dsub + j).toDouble *
            model.codebook(off + j).toDouble
          j += 1
        }
        lut(i * model.k + c) = acc
        c += 1
      }
      i += 1
    }
    lut
  }

  /** Brute-force top-k over a PQ-coded corpus by ADC: zero shuffle, zero
    * decode — each row scores in `m` lookup-table reads, and only the
    * top-k ordering moves (TakeOrdered). Same output contract as
    * [[Similarity.cosineTopK]].
    */
  def adcTopK(codes: DataFrame, probe: Array[Float], k: Int,
              model: PqModel): DataFrame = {
    registered(codes)
    codes.select(col("vec_id"),
        round(call_function("graft_pq_adc", col("pq_codes"),
          typedlit(adcLut(model, probe))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
