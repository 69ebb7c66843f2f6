package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Generator-driven properties (SURVEY §5.2.3): dedup idempotence, band
  * join equivalence, interpolation envelope bounds — raw scalacheck
  * (sbt runs Properties suites natively; the scalatest bridge is not in
  * the offline cache).
  */
object PropertySpec extends Properties("graft.ops") {

  // Few cases (every case runs Spark jobs) and a PINNED initial seed:
  // the KLL envelope below is a statistical bound, so red/green must not
  // depend on which seeds a given run happens to draw.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)
      .withInitialSeed(org.scalacheck.rng.Seed(20260814L))

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("PropertySpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val valuesGen: Gen[List[Double]] =
    Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))

  property("exactDedup idempotent, keeps min ids") = Prop.forAll(valuesGen) { vs =>
    import spark.implicits._
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, math.round(v / 10.0) * 10.0) }
      .toDF("id", "v")
    val d1 = Dedup.exactDedupByKey(df, col("v"), col("id"))
    val d2 = Dedup.exactDedupByKey(
      d1.select(col("keep_id").as("id"), col("dedup_key").as("v")),
      col("v"), col("id"))
    val viaSql = df.groupBy("v").agg(min("id").as("m"))
    d1.count() == d2.count() &&
      d1.join(viaSql, d1("dedup_key") === viaSql("v"))
        .filter(col("keep_id") =!= col("m")).count() == 0
  }

  property("bandPairs == naive pairs for random eps/data") = Prop.forAll(
    for { vs <- valuesGen; eps <- Gen.chooseNum(0.1, 20.0) } yield (vs, eps)
  ) { case (vs, eps) =>
    import spark.implicits._
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val binned = Dedup.bandPairs(df, "id", "v", eps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (a, i) <- vs.zipWithIndex; (b, j) <- vs.zipWithIndex
      if i < j && math.abs(a - b) < eps
    } yield (i.toLong, j.toLong)).toSet
    binned == naive
  }

  // the stream-safe row-local band derivation must equal the grouped
  // (oracle-shaped) form on ARBITRARY corpora — not just the fixed
  // fixture: empty/whitespace docs, exactly-n-token docs, repeated
  // tokens, unicode, duplicate texts (both hash families)
  property("lshBandTableLocal == grouped lshBandTable on random corpora") = Prop.forAll(
    for {
      n <- Gen.chooseNum(1, 15)
      texts <- Gen.listOfN(n, Gen.oneOf(
        Gen.const(""), Gen.const("   "), Gen.const("a b c"),
        Gen.const("héllo wörld 你好 tōken"),
        Gen.chooseNum(1, 9).flatMap(k =>
          Gen.listOfN(k, Gen.oneOf("the", "fast", "key", "sort", "a"))
            .map(_.mkString(" ")))))
      bands <- Gen.oneOf((2, 2), (4, 2))
    } yield (texts, bands)
  ) { case (texts, (nb, rpb)) =>
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    rows(Dedup.lshBandTableLocal(docs, "doc_id", "text", nb, rpb)) ==
      rows(Dedup.lshBandTable(docs, "doc_id", "text", nb, rpb))
  }

  // full-probe coarse assignment must be EXACTLY flat assignment on
  // arbitrary shapes: nCoarse above/below/equal the cell count, duplicate
  // vectors, single-vector corpora — ties included
  property("assignCoarse(wProbe = nCoarse) == assign on random corpora/shapes") = Prop.forAll(
    for {
      n <- Gen.chooseNum(1, 24)
      dup <- Gen.prob(0.3)
      nlist <- Gen.chooseNum(1, 6)
      nCoarse <- Gen.oneOf(1, 2, 4, 8)
    } yield (n, dup, nlist, nCoarse)
  ) { case (n, dup, nlist, nCoarse) =>
    import spark.implicits._
    val vecs = (0 until n).map { i =>
      val src = if (dup) i / 2 else i
      val raw = (0 until 8).map(j =>
        (((src * 31 + j * 17) % 13) - 6).toFloat)
      val nrm = math.sqrt(raw.map(x => x * x).sum).toFloat max 1e-6f
      (i.toLong, raw.map(_ / nrm))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = IvfIndex.build(emb, nlist = math.min(nlist, n), iters = 1,
      maxTrainRows = Long.MaxValue).centroids
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    cells(IvfIndex.assignCoarse(emb, cents, nCoarse, wProbe = nCoarse)) ==
      cells(IvfIndex.assign(emb, cents))
  }

  property("interpolated values stay inside the knot envelope") = Prop.forAll(
    for {
      n <- Gen.chooseNum(2, 8)
      ts <- Gen.listOfN(n, Gen.chooseNum(0.0, 100.0)).map(_.distinct.sorted)
        .suchThat(_.length >= 2)
      vs <- Gen.listOfN(ts.length, Gen.chooseNum(-50.0, 50.0))
      probes <- Gen.listOfN(10, Gen.chooseNum(-10.0, 110.0))
    } yield (ts.zip(vs), probes)
  ) { case (curve, probeTs) =>
    import spark.implicits._
    val curveDf = curve.map { case (t, v) => (0, t, v) }.toDF("bc_id", "t", "v")
    val probesDf = probeTs.map(t => (0, t)).toDF("bc_id", "t")
    val got = TimeOps.interpolateCurve(curveDf, probesDf).collect()
    val lo = curve.map(_._2).min - 1e-9
    val hi = curve.map(_._2).max + 1e-9
    got.length == probeTs.length &&
      got.forall { r => val v = r.getDouble(2); v >= lo && v <= hi }
  }

  private val tokenGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "x")))

  property("BpeMergesF == chained mergeFold reference on random corpora") = Prop.forAll(
    for {
      docs <- Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, tokenGen))
      merges <- Gen.someOf(Seq(("a", "b"), ("b", "a"), ("a", "a"),
        ("c", "a"), ("ab", "c")))
    } yield (docs, merges.toList)
  ) { case (docs, merges) =>
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val out = df.select(
        TextOps.applyMergesReference(col("toks"), merges).as("ref"),
        TextOps.applyMerges(spark, col("toks"), merges).as("fast"))
      .collect()
    out.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
  }

  // The incremental trainer (maintained pair-count table, r11 verdict #7)
  // must be indistinguishable from the full-recount reference: identical
  // merge sequence (argmax + tie-break + stop rule) AND identical final
  // corpus. Small alphabet so repeated pairs (hence multi-round merges,
  // count ties, and mid-train stops) all actually occur.
  property("incremental trainPhraseMerges == full-recount reference") = Prop.forAll(
    for {
      docs <- Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, tokenGen))
      n <- Gen.chooseNum(1, 4)
    } yield (docs, n)
  ) { case (docs, n) =>
    import spark.implicits._
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val (mi, ci) = TextOps.trainPhraseMerges(df, "doc_id", "text", n)
    val (mr, cr) = TextOps.trainPhraseMergesRecount(df, "doc_id", "text", n)
    val corpusOf = (c: org.apache.spark.sql.DataFrame) =>
      c.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    mi == mr && corpusOf(ci) == corpusOf(cr)
  }

  // SCD2 state-run compaction against the obvious driver-side fold:
  // random per-user state logs (small alphabet incl. nulls so same-state
  // runs, null runs, and ties-by-order all occur) must produce identical
  // (run_id, state, valid_from, valid_to, n_events) tables.
  property("stateRuns == naive per-user fold on random change logs") = Prop.forAll(
    for {
      n <- Gen.chooseNum(1, 40)
      states <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", null))
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
    } yield states.zip(ts)
  ) { log =>
    import spark.implicits._
    val rows = log.zipWithIndex.map { case ((st, t), i) =>
      (1L + i % 2, t, i.toLong, st)
    }
    val df = rows.toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = TimeOps.stateRuns(df).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      // fold into (state, from, n) runs; first run id mirrors the
      // !(NULL <=> NULL) quirk: 0 when the first state is null
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      sorted.foreach { case (_, t, _, st) =>
        if (runs.nonEmpty && runs.last._1 == st)
          runs(runs.size - 1) = runs.last.copy(_3 = runs.last._3 + 1)
        else runs += ((st, t, 1L))
      }
      val rid0 = if (sorted.head._4 == null) 0L else 1L
      runs.zipWithIndex.map { case ((st, from, n), i) =>
        val to = if (i + 1 < runs.size) runs(i + 1)._2 else -1L
        (u, rid0 + i, st, from, to, n)
      }
    }.toSet
    got == want
  }

  // Late-correction merge: recomputing only the affected keys and
  // passing untouched runs through must be row-identical (run_id
  // included) to the full recompute over archive ∪ late, for ANY random
  // split of the log into on-time and late — including all-late users
  // (archive side empty for that key), empty late batches (merge ≡
  // existing), and late events landing inside compacted runs (splits,
  // fuses, re-opened history).
  property("stateRunsMerge == full stateRuns recompute on random late splits") = Prop.forAll(
    for {
      n <- Gen.chooseNum(1, 40)
      states <- Gen.listOfN(n, Gen.oneOf("A", "B", "C", null))
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
      late <- Gen.listOfN(n, Gen.prob(0.3))
    } yield states.zip(ts).zip(late)
  ) { log =>
    import spark.implicits._
    val rows = log.zipWithIndex.map { case (((st, t), isLate), i) =>
      (1L + i % 3, t, i.toLong, st, isLate)
    }
    val all = rows.map(r => (r._1, r._2, r._3, r._4))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val onTime = rows.filter(!_._5).map(r => (r._1, r._2, r._3, r._4))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val late = rows.filter(_._5).map(r => (r._1, r._2, r._3, r._4))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    def rowSet(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSet
    val merged = TimeOps.stateRunsMerge(TimeOps.stateRuns(onTime), onTime, late)
    rowSet(merged) == rowSet(TimeOps.stateRuns(all))
  }

  // Interval union against the obvious driver-side sweep: same merged
  // count and covered length for random per-user event times (duplicates
  // and touching intervals included — ts range small so they occur).
  property("intervalUnion == naive sweep on random event sets") = Prop.forAll(
    for {
      n <- Gen.chooseNum(1, 40)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 200L))
      len <- Gen.chooseNum(1L, 50L)
    } yield (ts, len)
  ) { case (ts, len) =>
    import spark.implicits._
    val ev = ts.zipWithIndex.map { case (t, i) => (1L + i % 3, t, i.toLong) }
      .toDF("user_id", "ts_ms", "event_id")
    val got = TimeOps.intervalUnion(ev, len).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = ts.zipWithIndex.groupBy { case (_, i) => 1L + i % 3 }
      .map { case (u, rows) =>
        val sorted = rows.map(_._1).sorted
        var nIv = 0L; var covered = 0L
        var curS = -1L; var curE = -1L
        sorted.foreach { t =>
          if (curS < 0 || t > curE) {
            if (curS >= 0) covered += curE - curS
            nIv += 1; curS = t; curE = t + len
          } else curE = math.max(curE, t + len)
        }
        covered += curE - curS
        u -> ((nIv, covered))
      }
    got == want
  }

  // The rank envelope is k-DEPENDENT: KLL's error is O(1/k), and a flat 2%
  // is only a k=256 property. k=32 admits ~5–7% worst-case; the replay
  // (n=1047, k=32, seed=0) measures 3.4% at q=0.5 and seed=1 gives 3.7% at
  // q=0.9 — both are EXPECTED within the k=32 envelope, not sketch defects
  // (production DefaultK=256, KllSketch.scala, serves ~0.3%). forAllNoShrink:
  // ScalaCheck's shrinker would otherwise walk k outside Gen.oneOf(32,64,256).
  property("KLL: exact weight, exact below capacity, c/k rank envelope above") = Prop.forAllNoShrink(
    for {
      n <- Gen.chooseNum(1, 3000)
      k <- Gen.oneOf(32, 64, 256)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (n, k, seed)
  ) { case (n, k, seed) =>
    val rnd = new scala.util.Random(seed)
    val vals = Seq.fill(n)(rnd.nextDouble() * 100 - 50)
    val s = graft.functions.KllState.empty(k)
    vals.foreach(s.insert)
    val sorted = vals.sorted
    val qs = Seq(0.1, 0.5, 0.9)
    val envelope = math.max(0.02, 2.8 / k) // 8.75% @k=32, 4.4% @k=64, 2% @k=256 — KllEnvelopeSweep measured max 7.55%/3.73%/0.95% over a 9000-case grid
    val envelopeOk = qs.forall { q =>
      val est = s.quantile(q)
      val lo = sorted.count(_ < est).toDouble / n
      val hi = sorted.count(_ <= est).toDouble / n
      val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
      err <= envelope || (n < k && err == 0.0)
    }
    val exactOk = n >= k || qs.forall { q =>
      s.quantile(q) == sorted((math.max(1, math.ceil(q * n).toLong) - 1).toInt)
    }
    s.totalWeight == n.toLong && envelopeOk && exactOk
  }

  property("TopKPerGroupAgg == sort-take reference for random groups/values/k") =
    Prop.forAll(for {
      n <- Gen.chooseNum(1, 80)
      groups <- Gen.chooseNum(1, 5)
      k <- Gen.chooseNum(1, 6)
      // a tiny value domain forces heavy ties — the tie-break path
      vs <- Gen.listOfN(n, Gen.chooseNum(0, 8))
    } yield (groups, k, vs)) { case (groups, k, vs) =>
      import spark.implicits._
      val rows = vs.zipWithIndex.map { case (v, i) =>
        ((i % groups).toLong, i.toLong, v.toDouble)
      }
      val agg = org.apache.spark.sql.functions.udaf(
        new graft.functions.TopKPerGroupAgg(k))
      val got = rows.toDF("g", "id", "v").repartition(3)
        .groupBy(col("g")).agg(agg(col("v"), col("id")).as("topk"))
        .select(col("g"), explode(col("topk")).as("t"))
        .select(col("g"), col("t._1").as("v"), col("t._2").as("id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._3, r._2)).sortBy { case (v, id) => (-v, id) }
          .take(k).map { case (v, id) => (g, v, id) }
      }.toSet
      got == want
    }

  property("bloom prefilter: never loses a match, composition == exact semi-join") =
    Prop.forAll(for {
      nFacts <- Gen.chooseNum(1, 120)
      facts <- Gen.listOfN(nFacts, Gen.chooseNum(0L, 40L))
      dim <- Gen.someOf(0L to 40L)
    } yield (facts, dim.toList)) { case (facts, dimKeys) =>
      import spark.implicits._
      val factsDf = facts.zipWithIndex
        .map { case (key, i) => (i.toLong, key) }.toDF("row_id", "key")
      val dimDf = dimKeys.toDF("dk")
      val pre = Bloom.prefilter(factsDf, col("key"), dimDf, expectedNdv = 64)
      val composed = pre.join(dimDf, pre("key") === dimDf("dk"), "left_semi")
        .select("row_id").collect().map(_.getLong(0)).toSet
      val exact = facts.zipWithIndex.collect {
        case (key, i) if dimKeys.contains(key) => i.toLong
      }.toSet
      composed == exact
    }
}
