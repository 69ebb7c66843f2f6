package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe of the LATE-TEXT correction
  * ([[graft.ops.UnifiedFlow.lateTextDecide]]/lateTextCommit) —
  * [[LateProbe]]'s text-side mirror: the claim under test is that a
  * late pass costs BATCH work, not CORPUS work — the exact/band
  * candidate probes are bucket-pruned index reads, the election
  * metadata comes through the keeper-meta store's pruned fetch, and
  * the evictions rewrite only the buckets the losers' keys hash to.
  *
  * Drive: build a unified text corpus of `batches` × `rows` docs via
  * the real flow (hash-derived distinct 20-word texts, no embeddings —
  * the text machinery is the subject), then run ONE late feed of
  * `lateRows` texts at prio 0 — half FRESH (attach + pack), half EXACT
  * twins of stored keepers (they beat the stored prio ≥ 1 by the
  * on-time election key and must EVICT the keeper from digest, bands,
  * and keeper-meta). Print the pass's decide and commit walls and the
  * correction mix at each corpus size: the walls must stay ~flat while
  * the corpus quadruples (run with e.g. `4 20000` then `16 20000`).
  * Ids stay ≢0 mod 100 (the declared pseudo-benchmark rule) so no
  * planted row decontaminates.
  */
object LateTextGrowthProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(4)
    val rows = args.lift(1).map(_.toInt).getOrElse(20000)
    val lateRows = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def textOf(idCol: org.apache.spark.sql.Column) = {
      val words = (0 until 20).map(j =>
        concat(lit("w"), pmod(xxhash64(idCol, lit(j)), lit(100000L))))
      concat(lit("the of "), concat_ws(" ", words: _*))
    }
    def docsOf(ids: org.apache.spark.sql.DataFrame) =
      ids.select(col("doc_id"), textOf(col("doc_id")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("embedding", lit(null).cast("array<float>"))

    val dir = java.nio.file.Files.createTempDirectory("ltgrowth")
      .toString + "/idx"
    val bench = graft.ops.CurationFlow.benchShingles(
      docsOf(spark.range(100).select((col("id") * 100).as("doc_id"))))
    var cursor = 0L
    val t0 = System.nanoTime()
    for (b <- 0 until batches) {
      val batch = docsOf(spark.range(rows)
        .select((col("id") * batches + b).as("doc_id")))
      val r = graft.ops.UnifiedFlow.ingest(dir, batch, bench, cursor,
        prio = b + 1L)
      cursor = r.cursor
    }
    println(f"corpus built: ${batches * rows}%,d docs over $batches " +
      f"batches, cursor=$cursor%,d (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // half fresh texts (attach + pack), half exact twins of stored
    // keepers (evict); every id ≢ 0 mod 100
    val fresh = spark.range(lateRows / 2)
      .select((col("id") * 100 + 700000001L).as("doc_id"),
        textOf(col("id") * 100 + 700000001L).as("text"))
    val twins = spark.range(lateRows / 2)
      .select((col("id") * 100 + 800000001L).as("doc_id"),
        textOf(col("id") * 100 + 1).as("text"))
    val late = fresh.unionByName(twins)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("prio", lit(0L))

    val tD = System.nanoTime()
    val staged = graft.ops.UnifiedFlow.lateTextDecide(dir, late, bench,
      cursor)
    val mix = staged.corrections.groupBy("status").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .sorted.mkString(" ")
    val wallD = (System.nanoTime() - tD) / 1e9
    val tC = System.nanoTime()
    graft.ops.UnifiedFlow.lateTextCommit(dir, staged)
    val wallC = (System.nanoTime() - tC) / 1e9
    println(f"late pass: decide=$wallD%.1fs commit=$wallC%.1fs " +
      f"corpus=${batches * rows}%,d late=$lateRows%,d mix: $mix")
    spark.stop()
  }
}
