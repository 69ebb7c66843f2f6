package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CONTINUOUS ANN SERVING from the built corpus (r15 verdict #4): the
  * missing piece between the corpus flows (which land kept vectors)
  * and the IVF machinery (which builds/saves/compacts) — a serving
  * index MAINTAINED as the kept corpus grows, without rebuilds.
  *
  * Loop per batch, exactly the production composition:
  *   1. [[graft.ops.VectorFlow.decide]]/commit a batch of synthetic
  *      unique vectors (the corpus build — first-wins dedup, kept-only
  *      indexing);
  *   2. [[graft.ops.IvfIndex.maintainAppend]] the KEPT vectors into the
  *      persisted serving index (assign at frozen centroids, append
  *      into the cell dirs, occupancy/drift watch);
  *   3. measure recall@10 of the served search (nprobe = 16) against
  *      the exact reference (nprobe = nlist — IVF-Flat full probe IS
  *      brute force, IvfIndexSpec's exactness pin) over a FIXED
  *      held-out probe set.
  *
  * Mid-soak a TIGHT new modality floods in (one k-means cell's worth of
  * near-parallel vectors — near enough to saturate a cell, far enough
  * apart to survive the 0.99-cosine dedup): the watch must flip to
  * `refine`, [[graft.ops.IvfIndex.refineInPlace]] splits the hot cells
  * (spherical sub-Lloyd), and recall must return to the envelope. The
  * claims under test, printed per batch: recall@10 FLAT within the
  * envelope across 20+ appended batches with no rebuild; the watch
  * firing exactly when occupancy crosses the cap; wall per batch flat.
  */
object IvfServeSoak {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(24)
    val rows = args.lift(1).map(_.toInt).getOrElse(10000)
    val plantAt = args.lift(2).map(_.toInt).getOrElse(batches * 3 / 5)
    // "pq" = maintain a PRODUCT-QUANTIZED serving index (r16 verdict #4:
    // refineInPlace now re-quantizes, so the PQ ladder must hold recall
    // through the same flood without rebuild). Recall is measured
    // against the SAME index at full probe — the yardstick isolates
    // cell-ranking recall from quantization error, which is the part
    // maintenance can regress.
    // "drift" / "driftpq" (r17): from `plantAt` on, the corpus SHIFTS to
    // a fresh center family — the watch must flip to `retrain`, and the
    // loop applies [[graft.ops.IvfIndex.retrainInPlace]] fed by the
    // corpus flow's own kept-vector store (the production source-of-
    // truth contract: a quantized index encoded the drifted rows under
    // the stale codebooks, so the codes alone cannot carry the retrain).
    // The extra `recon` column — mean cosine of the index's decoded
    // rows vs the stored TRUE vectors — shows the stale-codebook
    // degradation and its recovery.
    // "driftflood" (r17): BOTH maintenance actions in one PQ run — the
    // tight-modality flood at `plantAt` (refine) and the distribution
    // shift from `plantAt + 4` on (retrain) — the watch's two verdicts
    // composing on one serving index, no rebuild.
    // "churn" (r18, the r17 verdict's #3): evict-heavy and DRIFT-FREE —
    // half of every batch's kept ids are tombstoned right after the
    // append, so neither refine nor retrain ever fires to purge them as
    // a side effect. The tombstone-fraction watch must recommend
    // `purge` as the dead fraction crosses the threshold, purgeInPlace
    // must compact (tombstone dir dropped, occupancy re-seeded), served
    // membership must equal the live accounting at every cycle, and the
    // serve wall must stay FLAT (without the purge the filtered dead
    // rows' IO and anti-join grow without bound in time).
    // "loop" (r19, the r18 verdict's #1): the SAME flood scenario as
    // "flat", but the corpus build AND the serving maintenance run
    // through the production streaming step
    // (StreamOps.vectorCurationStep with a StreamOps.Serving attached)
    // instead of this soak's hand-rolled decide/commit/maintain
    // sequence — the bootstrap, the lane-ledgered appends, and the
    // watch's applied refine all happen INSIDE the loop; the soak only
    // measures. Claims: the in-loop watch fires refine at the flood,
    // recall@10 recovers to the envelope, serve wall flat.
    val mode = args.lift(3).getOrElse("flat")
    val drifting = mode.startsWith("drift")
    val churn = mode == "churn"
    val quantized = mode == "pq" || mode == "driftpq" || mode == "driftflood"
    val driftAt = if (mode == "driftflood") plantAt + 4
      else if (drifting) plantAt else Int.MaxValue
    val floodAt =
      if (mode == "drift" || mode == "driftpq" || churn) -1 else plantAt
    val nlist = 256
    val cap = 2500L
    val dim = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // CLUSTERED corpus — the realistic embedding shape (and the shape
    // IVF exists for): each vector = a hash-seeded unit CENTER (one of
    // K=2048) plus per-vector noise, normalized. Noise scale 0.15 on
    // ±1-uniform center components gives ~8.5° angular spread per
    // cluster: same-cluster pairwise cosines ~0.978 (they SURVIVE the
    // 0.99 dedup), inter-center angles ~60°+ (clusters map cleanly
    // onto IVF cells).
    def mixVec(idCol: org.apache.spark.sql.Column,
               cidCol: org.apache.spark.sql.Column,
               noiseScale: Double) = {
      val comps = (0 until dim).map { j =>
        val c = pmod(xxhash64(cidCol, lit(j)), lit(1000000L))
          .cast("double") / lit(500000.0) - lit(1.0)
        val n = (pmod(xxhash64(idCol, lit(j + 1000)), lit(1000000L))
          .cast("double") / lit(500000.0) - lit(1.0)) * lit(noiseScale)
        c + n
      }
      val arr = array(comps.map(_.cast("float")): _*)
      val nrm = sqrt(aggregate(transform(arr,
        x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))
      transform(arr, x => (x.cast("double") / nrm).cast("float"))
    }
    val K = 2048L
    def corpusVec(idCol: org.apache.spark.sql.Column) =
      mixVec(idCol, pmod(xxhash64(idCol, lit(77)), lit(K)), 0.15)
    // the DRIFTED distribution: same clustered shape, a center family
    // the corpus has never used (cid offset past K)
    def driftVec(idCol: org.apache.spark.sql.Column) =
      mixVec(idCol, pmod(xxhash64(idCol, lit(77)), lit(K)) + lit(1000000L),
        0.15)
    def mkBatch(b: Int) = {
      val fresh = spark.range(rows)
        .select((col("id") * batches + b).as("vec_id"),
          (if (b >= driftAt) driftVec(col("id") * batches + b)
           else corpusVec(col("id") * batches + b)).as("embedding"))
      if (b != floodAt) fresh
      // the NEW MODALITY: one fresh center the corpus has never used
      // (cid tag 999999), noise 0.17 — a ~9° blob (one or two cells at
      // ~60° cell spacing) whose pairwise cosines sit safely BELOW the
      // 0.99 dedup threshold (measured: 0.12 noise left a max-cos tail
      // ≥ 0.99, the verified CC percolated, and the whole blob
      // first-wins-collapsed to ONE keeper — the flow doing its job;
      // the serving-index flood must be made of genuinely distinct
      // vectors)
      else fresh.unionByName(spark.range(4 * cap)
        .select((col("id") + 900000000L).as("vec_id"),
          mixVec(col("id") + 900000000L, lit(999999L), 0.17)
            .as("embedding")))
    }

    val base = java.nio.file.Files.createTempDirectory("ivfserve").toString
    val vdir = s"$base/corpus"
    val idx = s"$base/serving"
    val p = graft.ops.VectorFlow.Params(minCos = 0.99, dim = dim, bits = 24)
    // fixed held-out probes: ids that never enter the corpus
    val probes = spark.range(32)
      .select((col("id") + 800000000L).as("probe_id"),
        corpusVec(col("id") + 800000000L).as("probe_emb"))
      .localCheckpoint()

    if (mode == "loop") {
      // the production wiring end to end: the streaming step owns the
      // decide/commit/ledger AND the serving maintenance (bootstrap,
      // lane-ledgered append, watch verdict applied) — the soak only
      // observes the watch and measures recall
      var lastWatch: Option[graft.ops.IvfIndex.MaintainWatch] = None
      val serving = Some(graft.streaming.StreamOps.Serving(idx,
        maxCellRows = cap, nlist = nlist,
        onWatch = w => lastWatch = Some(w)))
      for (b <- 0 until batches) {
        def t[A](f: => A): (A, Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        lastWatch = None
        val (_, wStep) = t {
          graft.streaming.StreamOps.vectorCurationStep(vdir,
            s"$base/decisions", p, serving = serving)(mkBatch(b), b.toLong)
        }
        val ((recall, ncells), wMeasure) = t {
          val model = graft.ops.IvfIndex.load(spark, idx)
          val nc = model.centroids.count().toInt
          def topk(np: Int) = graft.ops.IvfIndex
            .searchTopKBatch(model, probes, 10, np)
            .select("probe_id", "vec_id")
          (topk(16).join(topk(nc), Seq("probe_id", "vec_id"))
            .count() / 320.0, nc)
        }
        val kept = graft.ops.CurationFlow.readLedger(spark, vdir)
          .map(_._3).getOrElse(0L)
        println(f"batch=$b%2d kept=$kept%8d " +
          f"act=${lastWatch.map(_.action).getOrElse("build")}%-7s " +
          f"maxCell=${lastWatch.map(_.maxCell).getOrElse(0L)}%6d " +
          f"cells=$ncells%4d " +
          f"cos=${lastWatch.map(_.meanAssignCos).getOrElse(1.0)}%.3f " +
          f"recall@10=$recall%.3f step=$wStep%5.1fs " +
          f"measure=$wMeasure%5.1fs")
      }
      spark.stop()
      return
    }

    var cursor = 0L
    var built = false
    var liveRows = 0L
    for (b <- 0 until batches) {
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // the maintained path: corpus-flow decide+commit, then the
      // serving append+watch — the walls the 100 TB claim is about
      val (staged, wFlow) = t {
        val s = graft.ops.VectorFlow.decide(vdir, mkBatch(b), cursor, p)
        graft.ops.VectorFlow.commit(vdir, s.kept, p, Some(s.keptBands),
          prio = b.toLong)
        s
      }
      cursor = staged.cursor
      val (watch, wMaint) = t {
        if (!built) {
          val model = graft.ops.IvfIndex.build(staged.kept, nlist, iters = 2)
          if (quantized)
            graft.ops.IvfIndex.saveQuantizedPq(model, idx,
              graft.ops.Pq.fit(staged.kept, m = 8))
          else graft.ops.IvfIndex.save(model, idx)
          built = true
          graft.ops.IvfIndex.MaintainWatch(0, 0, cap, 0, 1.0, 1.0, "build")
        } else
          // ledgered (r16 ADVICE): the soak is the redelivering-caller
          // shape — batchId makes the mutation exactly-once
          graft.ops.IvfIndex.maintainAppend(spark, idx, staged.kept, cap,
            batchId = b.toLong)
      }
      // churn: tombstone half of THIS batch's kept ids (distinct ids
      // per batch, so the no-re-append contract holds by construction);
      // live accounting tracked for the membership assert below
      val evicted = if (churn && built && b >= 1) {
        // hash split, NOT vec_id parity: ids are id*batches + b, so with
        // an even batch count parity is a constant per batch and a
        // parity filter evicts all-or-nothing instead of half
        val ev = staged.kept.select("vec_id")
          .filter(pmod(xxhash64(col("vec_id"), lit(99)), lit(2)) === 0)
        val n = ev.count()
        graft.ops.IvfIndex.maintainRemove(spark, idx, ev)
        n
      } else 0L
      liveRows += (if (b == 0) staged.kept.count()
        else watch.appended) - evicted
      // the loop simply applies the watch's verdict — the drift-streak
      // escalation (retrain over refine when drift persists past a
      // first hot-celled reading) is watch-native via the sidecar
      val (act, wRefine) = t {
        if (watch.action == "purge") {
          graft.ops.IvfIndex.purgeInPlace(spark, idx)
          "purged"
        } else if (watch.action == "retrain") {
          // the production source-of-truth contract: retrain from the
          // corpus flow's kept-vector store, never from the codes
          graft.ops.IvfIndex.retrainInPlace(spark, idx,
            source = Some(spark.read.parquet(s"$vdir/vectors")
              .select("vec_id", "embedding")))
          "retrained"
        } else if (watch.action == "refine") {
          graft.ops.IvfIndex.refineInPlace(spark, idx, cap,
            splitInto = math.max(2, (watch.maxCell / cap + 1).toInt),
            iters = 3)
          "refined"
        } else "-"
      }
      // MEASUREMENT harness (not the maintained path): recall@10 of the
      // served search vs the full-probe exact reference — the exact
      // side scans the whole corpus by construction, so ITS wall grows
      // linearly; it is the yardstick, not the claim. In drift modes,
      // `recon` = mean decoded-vs-stored cosine (stale-codebook damage
      // and its recovery — cell ranking alone cannot see it).
      val ((recall, ncells, recon), wMeasure) = t {
        val model = graft.ops.IvfIndex.load(spark, idx)
        val nc = model.centroids.count().toInt
        if (churn) {
          // served membership ≡ the live accounting at EVERY cycle —
          // across evictions, purges, and the batches in between
          val sv = model.assignments.count()
          assert(sv == liveRows,
            s"batch $b: served $sv rows, live accounting says $liveRows")
        }
        def topk(np: Int) = graft.ops.IvfIndex
          .searchTopKBatch(model, probes, 10, np)
          .select("probe_id", "vec_id")
        val hits = topk(16).join(topk(nc), Seq("probe_id", "vec_id"))
          .count()
        val rc = if (!drifting) 1.0
          else model.assignments
            .join(spark.read.parquet(s"$vdir/vectors")
              .select(col("vec_id"), col("embedding").as("t")),
              Seq("vec_id"))
            .agg(avg(graft.ops.Similarity.cosine(col("embedding"),
              col("t"))))
            .head().getDouble(0)
        (hits / 320.0, nc, rc)
      }
      println(f"batch=$b%2d kept=$cursor%8d act=${watch.action}%-7s " +
        f"maxCell=${watch.maxCell}%6d cells=$ncells%4d " +
        f"cos=${watch.meanAssignCos}%.3f fix=$act%-9s " +
        f"recall@10=$recall%.3f recon=$recon%.3f " +
        f"tombFrac=${watch.tombstoneFrac}%.3f live=$liveRows%8d " +
        f"flow=$wFlow%5.1fs " +
        f"maint=$wMaint%5.1fs fixw=$wRefine%5.1fs measure=$wMeasure%5.1fs")
    }
    spark.stop()
  }
}
