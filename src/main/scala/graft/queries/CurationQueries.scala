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

    // Benchmark decontamination: documents sharing any distinct 3-token
    // shingle with the pseudo-benchmark set (doc_id % 100 == 0) are
    // flagged, with the exact overlapping-shingle count. Shape at 100 TB:
    // the benchmark shingle set is eval-sized (small) so it broadcasts;
    // the corpus side is one explode + one broadcast equi-join + one
    // hash agg — linear, never pairwise. Shingle construction shared
    // with q_ngram_jaccard (WordShinglesF, equivalence already pinned).
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = docs
        .select(col("doc_id"), array_distinct(graft.functions.WordShinglesF
          .shingles(s, split(trim(col("text")), "\\s+"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
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
    })
  )

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
    "q_decontaminate" ->
      ("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents), """ +
        """sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM tok WHERE len(t) >= 3), """ +
        """bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 100 = 0), """ +
        """corpus AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 100 <> 0), """ +
        """hits AS (SELECT doc_id, COUNT(DISTINCT c.shingle) AS n_hits FROM corpus c JOIN bench b ON c.shingle = b.shingle GROUP BY doc_id) """ +
        """SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS contaminated """ +
        """FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id WHERE d.doc_id % 100 <> 0 ORDER BY d.doc_id""")
  )
}
