package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 SQL-surface extensions: set-returning projections, window-frame
  * variants the core catalog didn't cover, sketch-based top-k, bitmap
  * distinct counting, and the range-partitioned global percentile. Each has
  * a DuckDB oracle in [[SurfaceQueries.sql]].
  */
object SurfaceQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // SRF — posexplode_outer: positional flattening that KEEPS rows whose
    // array is empty (null pos/tok), the generator-side contract a filter
    // pipeline needs to not silently drop short documents. The slice length
    // doc_id % 3 plants empty arrays deterministically.
    "q_posexplode_outer" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("slice(split(trim(text), '\\\\s+'), 1, int(doc_id % 3))").as("toks"))
        .select(col("doc_id"), posexplode_outer(col("toks")).as(Seq("pos", "tok")))
        .orderBy(col("doc_id"), col("pos").asc_nulls_last)
    }),

    // W-extra — rank-family windows: quartile bucket, percent_rank,
    // cume_dist per customer (unique tie-break on o_orderkey; exact-double
    // emission — both engines derive the same integer ratios).
    "q_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W-extra — EXCLUDE CURRENT ROW emulation: each order vs the average of
    // the customer's OTHER orders. Spark lacks frame exclusion, so the
    // whole-partition sum/count minus the current row is the rewrite
    // (decimal-exact subtraction → bit-identical to DuckDB's native
    // EXCLUDE CURRENT ROW frame). Single-order customers → NULL, matching
    // the empty excluded frame.
    "q_window_exclude" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      val cnt = count(lit(1)).over(w)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          when(cnt > 1,
            (sum(dec(col("o_totalprice"))).over(w) - dec(col("o_totalprice")))
              .cast("double") / (cnt - 1).cast("double"))
            .as("avg_others"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Sketch — approx_top_k (Spark 4 frequent-items sketch over the bounded
    // lang column, where the sketch is exact — same contract as
    // q_heavy_hitters but via the engine-native aggregate).
    "q_approx_top_k" -> ((s, d) => {
      Tables.documents(s, d)
        .agg(expr("approx_top_k(lang, 3)").as("tk"))
        .select(explode(col("tk")).as("x"))
        .select(col("x.item").as("lang"), col("x.count").cast("long").as("cnt"))
        .orderBy(desc("cnt"), col("lang"))
    }),

    // A4 scale path — EXACT distinct count via bitmaps: two-level
    // bucket/bit aggregation (bitmap_bucket_number / bitmap_construct_agg /
    // bitmap_count). Each 32k-key bucket collapses to a fixed 4 KB bitmap
    // before the second shuffle — the pre-aggregated exact-distinct shape
    // that survives 100 TB where count(distinct) shuffles raw keys.
    "q_bitmap_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_suppkey)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_suppkey))").as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_supp"))
        .orderBy("l_returnflag")
    }),

    // A6 refinement — exact global percentiles over ONE giant group by
    // range-partitioned global ranking (ops.Quantiles.exactPercentilesGlobal):
    // no single sort partition ever holds the whole table.
    "q_percentile_global" -> ((s, d) => {
      graft.ops.Quantiles
        .exactPercentilesGlobal(Tables.lineitem(s, d), "l_extendedprice",
          Seq(0.5, 0.9, 0.99))
        .select(round(col("p0"), 4).as("p50"), round(col("p1"), 4).as("p90"),
          round(col("p2"), 4).as("p99"))
    })
  )

  val sql: Map[String, String] = Map(
    "q_posexplode_outer" ->
      ("""WITH tok AS (SELECT doc_id, list_slice(string_split_regex(trim(text), '\s+'), 1, CAST(doc_id % 3 AS INTEGER)) AS t FROM documents), """ +
        """ex AS (SELECT doc_id, CAST(x.i - 1 AS INTEGER) AS pos, t[CAST(x.i AS INTEGER)] AS tok FROM tok, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) x), """ +
        """emp AS (SELECT doc_id, CAST(NULL AS INTEGER) AS pos, CAST(NULL AS VARCHAR) AS tok FROM tok WHERE len(t) = 0) """ +
        """SELECT doc_id, pos, tok FROM ex UNION ALL SELECT doc_id, pos, tok FROM emp ORDER BY doc_id, pos"""),
    "q_ntile" ->
      """SELECT o_custkey, o_orderkey, CAST(NTILE(4) OVER w AS INTEGER) AS quartile, PERCENT_RANK() OVER w AS pct_rank, CUME_DIST() OVER w AS cume FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) ORDER BY o_custkey, o_orderkey""",
    "q_window_exclude" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER x AS DOUBLE) / CAST(COUNT(*) OVER x AS DOUBLE) AS avg_others FROM orders WINDOW x AS (PARTITION BY o_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) ORDER BY o_custkey, o_orderkey""",
    "q_approx_top_k" ->
      """SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang ORDER BY cnt DESC, lang LIMIT 3""",
    "q_bitmap_distinct" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_percentile_global" ->
      """SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50, ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90, ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99 FROM lineitem"""
  )
}
