package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-query integer SELF-VERDICTS for the flow-composition keys that
  * are genuinely oracle-proof (r19 — the r18 verdict's #2): the three
  * multi-store flow keys (`q_vector_curation`, `q_unified_curation`,
  * `q_unified_late`) compose seeded-hyperplane banding with persisted
  * stores, so DuckDB cannot reproduce their row sets — the driver
  * records a rows-only check, which would miss a silently skipped
  * verification or a store that lost a row. The `q_tokenize_stats`
  * treatment closes that gap: each key re-verifies its own contracts
  * IN the query and emits the verdicts as integer columns; the local
  * gate (`tools/check.py`) requires every `*_ok` column of a no-oracle
  * key to be all-1, so a planted regression flips the column and FAILS
  * the gate even without a SQL twin. FlowVerdictsSpec plants exactly
  * such regressions against these expressions.
  *
  * The expressions live here (not inline in the keys) so the planted-
  * regression spec drives the very code the gate runs. All three are
  * Columns over conventionally-named inputs, documented per method.
  */
private[graft] object Verdicts {

  /** Distinct-id membership flag of a parquet store, absent-safe:
    * returns (`idCol` LONG, `flag` = true). Join it (left) to decision
    * rows and test the flag with [[storeOkCol]].
    */
  def storedFlag(spark: SparkSession, path: String, idCol: String,
                 flag: String = "__stored"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(p))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol,
              org.apache.spark.sql.types.LongType))))
      else spark.read.parquet(path)
        .select(col(idCol).cast("long").as(idCol)).distinct()
    ids.withColumn(flag, lit(true))
  }

  /** `dup_cos_ok` over rows carrying `status`, `__e` (the row's own
    * input embedding) and `__m` (its matched keeper's): a status in
    * `cosStatuses` re-verifies TRUE cosine >= `minCos` (the flows'
    * verified-drop contract, recomputed from the raw inputs with the
    * same expression the decide used); a status in `exactStatuses`
    * requires byte-equal vectors (digest-equality's observable); every
    * other row is vacuously 1. A NULL input on a checked status reads
    * 0, never a silent pass — a drop whose inputs can't be found is a
    * broken contract, not a skipped check.
    */
  def dupCosOkCol(exactStatuses: Seq[String], cosStatuses: Seq[String],
                  minCos: Double): Column =
    when(col("status").isin(cosStatuses: _*),
        coalesce((graft.ops.Similarity.cosine(col("__e"), col("__m"))
          >= minCos).cast("int"), lit(0)))
      .when(col("status").isin(exactStatuses: _*),
        coalesce((col("__e") === col("__m")).cast("int"), lit(0)))
      .otherwise(lit(1))

  /** `store_ok` over a joined [[storedFlag]] column: rows satisfying
    * `presentCond` must be IN the store, every other row must NOT be —
    * kept-iff-stored, the membership contract a lost or leaked store
    * row breaks on exactly its own decision row.
    */
  def storeOkCol(presentCond: Column, flag: String = "__stored"): Column =
    when(presentCond, col(flag).isNotNull)
      .otherwise(col(flag).isNull).cast("int")

  /** `pack_ok` over packed rows (`n_tok`, `seq_id`, `seq_offset`):
    * reconstructs each row's global token cursor
    * (`cb = seq_id*budget + seq_offset`) and requires it to equal
    * `start` + the exact prefix sum of every earlier packed row's
    * n_tok — gap-free, collision-free, budget-aligned packing is fully
    * determined by this one per-row equality (plus the offset staying
    * inside [0, budget)). Rows with NULL pack fields (drops) are
    * vacuously 1. The prefix window is a single global sort — the
    * VERDICT's price, not the operator's (Packing itself runs the
    * two-phase distributed prefix; at 100 TB the verdict would sample
    * or run per-partition with the same bases).
    */
  def packOkCol(budget: Long, start: Long = 0L): Column = {
    val cb = col("seq_id") * budget + col("seq_offset")
    val w = org.apache.spark.sql.expressions.Window.orderBy(cb)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    when(col("n_tok").isNull || col("seq_id").isNull, lit(1))
      .otherwise((col("seq_offset") >= 0 && col("seq_offset") < budget &&
        cb === lit(start) + coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .cast("int"))
  }
}
