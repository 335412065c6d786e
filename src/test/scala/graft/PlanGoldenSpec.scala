package graft

import java.nio.file.{Files, Paths}

/** Golden-plan snapshots — the reference's checked-in plan-XML mechanism
  * (flink-table-planner-blink test resources, RankTest.xml etc.): optimizer
  * output for flagship queries is normalized (expr-ids and paths stripped)
  * and diffed against committed golden files, so optimizer-visible
  * regressions (lost pushdown, extra shuffles, changed join strategy) fail
  * loudly. Regenerate with GRAFT_REGEN_GOLDEN=true sbt test. */
class PlanGoldenSpec extends GraftSpec {

  private val goldenDir = "src/test/resources/golden"

  private def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+L?", "#N")             // expr ids
      .replaceAll("plan_id=\\d+", "plan_id=N")
      .replaceAll("file:[^,\\]\\)]*", "file:PATH")
      .replaceAll("Location: \\S+", "Location: L")
      .replaceAll("(?m)\\s+$", "")

  private def check(name: String, q: Q): Unit = test(s"golden plan: $name") {
    val plan = normalize(q.run(spark, sfDir).queryExecution.optimizedPlan.toString)
    val path = Paths.get(s"$goldenDir/$name.txt")
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("true")) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, plan)
    } else {
      assert(Files.exists(path), s"golden file missing — regen with GRAFT_REGEN_GOLDEN=true")
      val golden = Files.readString(path)
      assert(plan == golden,
        s"optimized plan drifted from golden.\n--- golden:\n$golden\n--- actual:\n$plan")
    }
  }

  check("q_agg_q1", operators.Relational.qAggQ1)
  check("q_join_topn", operators.Relational.qJoinTopN)
  check("q_topn", operators.Relational.qTopN)
  check("q_window_tumble", operators.TimeWindows.qWindowTumble)
  check("q_cosine_topk_bucketed", operators.SimilarityOps.qCosineTopKBucketed)
  // r9 flagships: the rollup→rank Expand shape and the graph edge-store
  // consumers (any lost semi-join, re-derived edge relation, or join
  // strategy change shows up as plan drift)
  check("q_tpcds_q67_shape", operators.TpcdsShapes.q67)
  check("q_tpcds_q23_shape", operators.TpcdsShapes.q23)
  check("q_graph_pagerank", operators.GraphOps.qPageRank)
}
