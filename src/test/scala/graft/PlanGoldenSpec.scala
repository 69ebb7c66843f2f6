package graft

/** Catalog-wide plan-shape golden (VERDICT r12 #2): PlanAuditSpec pins
  * ~35 keys' load-bearing shapes by hand; silent plan drift on the other
  * ~80 was only caught if it moved a bench median past the 1.5× rule —
  * box noise can mask that. This spec snapshots, for EVERY catalog key,
  * the per-kind physical-operator counts that define a plan's scale
  * behavior — shuffle `Exchange`, `BroadcastExchange`, `Sort`,
  * `SortMergeJoin`, `BroadcastHashJoin`, `Generate`, `CartesianProduct` —
  * into a checked-in JSON-lines golden and diffs it at HEAD.
  *
  * Counts come from the STATIC physical plan (`executedPlan.toString`
  * before any action, the same surface PlanAuditSpec asserts on): it is
  * deterministic under the pinned test session (local[4], shuffle=4,
  * sf0.001 stats), where post-execution AQE shapes can flap with runtime
  * stage sizes. A regression this spec exists for — an extra exchange, a
  * broadcast degrading to sort-merge, a new Generate blow-up — appears in
  * the static plan first.
  *
  * Regenerating after a DELIBERATE plan change:
  *
  *   GRAFT_PLAN_GOLDEN_REGEN=1 sbt "testOnly graft.PlanGoldenSpec"
  *
  * then review the `plan_golden.json` diff in the commit — the review IS
  * the gate; an unreviewed regen would just re-bless the drift.
  */
class PlanGoldenSpec extends SparkTestBase {

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/plan_golden.json")

  private val kinds = Seq("Exchange", "BroadcastExchange", "Sort",
    "SortMergeJoin", "BroadcastHashJoin", "Generate", "CartesianProduct",
    "ReadCols", "PushedFilters")

  /** First operator token of a plan line: strip the tree-drawing prefix,
    * take the leading identifier. Exact token equality keeps `Sort`
    * distinct from `SortMergeJoin` and skips `ReusedExchange`.
    */
  private def opToken(line: String): String =
    line.dropWhile(c => !c.isLetter).takeWhile(_.isLetterOrDigit)

  /** Top-level comma count + 1 of a bracketed list body, depth-aware
    * (`struct<a:int,b:array<float>>` is 2 fields, not 3); empty body = 0.
    */
  private def topLevelCount(body: String): Int = {
    val t = body.trim
    if (t.isEmpty) 0
    else {
      var depth = 0; var n = 1
      t.foreach {
        case '<' | '(' | '[' => depth += 1
        case '>' | ')' | ']' => depth -= 1
        case ',' if depth == 0 => n += 1
        case _ =>
      }
      n
    }
  }

  /** Operator counts plus two scan-health measures the operator counts
    * can't see: the summed ReadSchema field count across all scans (a
    * pruning regression widens it without touching any operator) and the
    * summed PushedFilters entry count (a lost pushdown shrinks it).
    */
  private def counts(name: String): Map[String, Int] = {
    val plan = SparkEntry.queries(name)(spark, Sf0001)
      .queryExecution.executedPlan.toString
    val tokens = plan.linesIterator.map(opToken).toSeq
    val readCols = "ReadSchema: struct<((?:[^<>]|<[^<>]*>)*)>".r
      .findAllMatchIn(plan).map(m => topLevelCount(m.group(1))).sum
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(m => topLevelCount(m.group(1))).sum
    kinds.dropRight(2).map(k => k -> tokens.count(_ == k)).toMap +
      ("ReadCols" -> readCols) + ("PushedFilters" -> pushed)
  }

  private def renderLine(name: String, c: Map[String, Int]): String =
    s"""{"key":"$name",""" +
      kinds.map(k => s""""$k":${c(k)}""").mkString(",") + "}"

  private val lineRe =
    ("""\{"key":"([^"]+)",""" +
      kinds.map(k => s""""$k":(\\d+)""").mkString(",") + """\}""").r

  test("every catalog key's plan-shape counts match the checked-in golden") {
    // suites share one SparkSession (and one CacheManager): another
    // suite's .cache() of a base table substitutes InMemoryTableScan
    // into these plans and shifts ReadCols/operator counts depending on
    // SUITE ORDER. Clear the cache so the golden always sees the
    // from-disk plans (suites run sequentially in the forked test JVM —
    // sbt's testForkedParallel defaults false — so this cannot race;
    // later suites lazily re-materialize).
    spark.sharedState.cacheManager.clearCache()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val got = names.map(n => n -> counts(n))
    if (sys.env.get("GRAFT_PLAN_GOLDEN_REGEN").contains("1")) {
      val body = got.map { case (n, c) => renderLine(n, c) }.mkString("", "\n", "\n")
      java.nio.file.Files.write(goldenPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"regenerated $goldenPath with ${got.size} keys — review the diff")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"$goldenPath missing — run GRAFT_PLAN_GOLDEN_REGEN=1 sbt 'testOnly graft.PlanGoldenSpec'")
      val golden = new String(java.nio.file.Files.readAllBytes(goldenPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map {
          case lineRe(key, vals @ _*) =>
            key -> kinds.zip(vals.map(_.toInt)).toMap
          case bad => fail(s"unparseable golden line: $bad")
        }.toMap
      val missing = names.filterNot(golden.contains)
      val stale = golden.keys.toSeq.filterNot(names.contains)
      val drifted = got.flatMap { case (n, c) =>
        golden.get(n).filter(_ != c).map { g =>
          val diff = kinds.filter(k => g(k) != c(k))
            .map(k => s"$k ${g(k)}→${c(k)}").mkString(", ")
          s"  $n: $diff"
        }
      }
      assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
        (if (missing.nonEmpty) s"keys not in golden (new key? regen deliberately): ${missing.mkString(", ")}\n" else "") +
        (if (stale.nonEmpty) s"golden keys no longer in catalog: ${stale.mkString(", ")}\n" else "") +
        (if (drifted.nonEmpty) s"plan-shape drift:\n${drifted.mkString("\n")}\n" else "") +
        "deliberate change? GRAFT_PLAN_GOLDEN_REGEN=1 sbt 'testOnly graft.PlanGoldenSpec' and review the diff")
    }
  }
}
