package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The r19-verdict guards on the serving attachment: one directory must
  * resolve to ONE monitor whatever the caller's spelling (verdict #2 —
  * the raw-string keys let `dir` and `dir/` coexist and silently void
  * the single-writer serialization), and maintainServing's validity
  * gate must mirror ALL of VectorFlow.commit's legs, frozen dimension
  * included (r19 ADVICE medium — the unified replay path hands the
  * full text-kept set to the serving cycle, dim-rejected embeddings
  * and all).
  */
class ServingGuardsSpec extends SparkTestBase {
  import spark.implicits._

  test("monitorKey: trailing slash, duplicate slash, and dot-segment spellings of one dir key one monitor; distinct dirs stay distinct") {
    val k = StreamOps.monitorKey _
    assert(k("/tmp/graft/x") === k("/tmp/graft/x/"))
    assert(k("/tmp/graft/x") === k("/tmp/graft//x"))
    assert(k("/tmp/graft/x") === k("/tmp/graft/./x"))
    assert(k("/tmp/graft/a/../x") === k("/tmp/graft/x"))
    assert(k("/tmp/graft/x") !== k("/tmp/graft/y"))
    // relative spellings resolve against the working dir — `dir` and
    // `./dir` are the same monitor, and both equal the absolute form
    assert(k("rel/dir") === k("./rel/dir"))
    assert(k("rel/dir") ===
      k(java.nio.file.Paths.get("rel/dir").toAbsolutePath.toString))
    // scheme'd URIs normalize too (no filesystem round-trip)
    assert(k("hdfs://nn:9000/a/b/") === k("hdfs://nn:9000/a/b"))
    assert(k("hdfs://nn:9000/a/./b") === k("hdfs://nn:9000/a/b"))
    assert(k("hdfs://nn:9000/a/b") !== k("hdfs://nn:9000/a/c"))
  }

  test("maintainServing: a dim-mismatched embedding the store's frozen-dim gate rejected never reaches the serving index (replay path)") {
    def vec(d: Int, a: Double): Seq[Float] = {
      val v = Array.fill(d)(0f)
      v(0) = math.cos(a).toFloat; v(1) = math.sin(a).toFloat; v.toSeq
    }
    def vdf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    val p = graft.ops.VectorFlow.Params(minCos = 0.99, dim = 8)
    val base = java.nio.file.Files.createTempDirectory("srvdim").toString
    val flowDir = s"$base/vec"
    // the store freezes dim=8 at the first decide; its gate would
    // reject any other width
    val r1 = graft.ops.VectorFlow.ingest(flowDir,
      vdf((0 until 4).map(i => (10L + i) -> vec(8, 0.4 * i))), 0L, p)
    assert(r1.cursor > 0)
    val sv = StreamOps.Serving(s"$base/serving", nlist = 2,
      driftMargin = 1.0)
    // first cycle bootstraps from the store (all 8-dim, all clean)
    StreamOps.maintainServing(sv, s"$flowDir/vectors",
      vdf(Seq(10L -> vec(8, 0.0))), None, 0L, lane = "t")
    def served = graft.ops.IvfIndex.load(spark, s"$base/serving")
      .assignments.select("vec_id").as[Long].collect().toSet
    assert(served === Set(10L, 11L, 12L, 13L))
    // REPLAY-shaped second cycle: the kept set carries a 4-dim
    // embedding the store's frozen-dim gate rejected (never stored,
    // never assigned — so the replay anti-join can't remove it either).
    // Without the dim leg this appended a wrong-width vector the store
    // never held, breaking served==store and mixing dims in the index.
    StreamOps.maintainServing(sv, s"$flowDir/vectors",
      vdf(Seq(50L -> vec(8, 2.0), 51L -> vec(4, 2.5))), None, 1L,
      lane = "t", replay = true)
    assert(served === Set(10L, 11L, 12L, 13L, 50L),
      "the 8-dim append serves; the dim-rejected one never does")
  }
}
