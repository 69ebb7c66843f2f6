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

  /** Add `pack_ok` to decision rows (`idCol` unique, `n_tok`,
    * `seq_id`, `seq_offset`): reconstructs each packed row's global
    * token cursor (`cb = seq_id*budget + seq_offset`) and requires the
    * layout to be the canonical gap-free, collision-free packing from
    * `start` — per row: its offset inside [0, budget) and its cb equal
    * to the PREVIOUS packed row's `cb + n_tok` (the first row's to its
    * partition base, chained from `start`). Adjacent-link equality
    * chained from `start` is exactly prefix-sum equality, checked
    * WITHOUT a single-partition global window (the naive
    * `Window.orderBy(cb)` serializes the corpus through one task — the
    * anti-pattern Packing's own two-phase prefix exists to avoid):
    * rows range-partition by cb, each partition checks its internal
    * links with a partitioned lag, and the partition boundary bases
    * are an nparts-row driver prefix — the [[graft.ops.Packing]]
    * scale shape, applied to the verdict. Rows with NULL pack fields
    * (drops) are vacuously 1.
    */
  def withPackOk(df: DataFrame, idCol: String, budget: Long,
                 start: Long = 0L): DataFrame = {
    val packed = df
      .filter(col("n_tok").isNotNull && col("seq_id").isNotNull &&
        col("seq_offset").isNotNull)
      .select(col(idCol),
        col("n_tok").cast("long").as("n_tok"),
        (col("seq_id") * budget + col("seq_offset")).as("__cb"),
        col("seq_offset"))
    // materialize the ranged layout once: the bounds aggregate and the
    // link check are separate jobs and __pid must name the same range
    // in both (Packing's own discipline)
    val ranged = org.apache.spark.sql.graftbridge.Bridge
      .dropCheckpointConstraints(packed
        .repartitionByRange(col("__cb")).sortWithinPartitions("__cb")
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint())
    val bounds = ranged.groupBy("__pid")
      .agg(max_by(col("__cb") + col("n_tok"), col("__cb")).as("lastEnd"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (bounds.isEmpty) return df.withColumn("pack_ok", lit(1))
    // each partition's expected base = the previous partition's actual
    // end (an internal gap flips inside its own partition and never
    // cascades), the first partition's = `start`
    val bases: Map[Int, Long] = {
      var acc = start
      bounds.map { case (pid, lastEnd) =>
        val b = (pid, acc); acc = lastEnd; b
      }.toMap
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__cb")
    val verdict = ranged
      .withColumn("__prevEnd",
        coalesce(lag(col("__cb") + col("n_tok"), 1).over(w),
          element_at(typedlit(bases), col("__pid"))))
      .select(col(idCol),
        (col("seq_offset") >= 0 && col("seq_offset") < budget &&
          col("__cb") === col("__prevEnd")).cast("int").as("pack_ok"))
    df.join(verdict, Seq(idCol), "left")
      .withColumn("pack_ok", coalesce(col("pack_ok"), lit(1)))
  }
}
