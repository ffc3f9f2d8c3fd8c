package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph + behavioral analytics operators with DuckDB oracles: an
  * iterative PageRank over the customer–supplier purchase graph, a
  * sequential conversion funnel, and a cohort-retention matrix over the
  * event stream. All exact integer/timestamp arithmetic end to end, so
  * the fixed-iteration / per-stage results replay bit-for-bit in SQL.
  */
object AnalyticsQueries {

  /** Fixed PageRank iteration count, shared with the unrolled oracle
    * CTE chain (one CTE per iteration).
    */
  private[queries] val PrIters = 4

  /** The funnel's ordered stages over the events table. */
  private[queries] val FunnelStages = Seq("signup", "view", "click", "purchase")

  private val edgeCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  /** Persisted symmetrized customer–supplier edge frame — one copy per
    * (session, sf dir) like the dedup word/shingle frames. PageRank
    * scans it 2 + iterations times (degrees, node set, every update),
    * so recomputing the lineitem–orders join + distinct each time would
    * dominate the whole query.
    */
  private def purchaseEdges(s: SparkSession, d: String): DataFrame =
    Tables.memo(edgeCache, (Tables.sessionKey(s), d))({
      val li = Tables.load(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey")
      val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      cs.select(col("c").as("src"), col("s").as("dst"))
        .union(cs.select(col("s").as("src"), col("c").as("dst")))
        .persist()
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the bipartite customer->supplier purchase graph
    // (symmetrized so rank circulates and every node keeps in-edges).
    // Node ids are disjoint by parity: customer c -> 2c, supplier s ->
    // 2s+1. Integer-grid ranks make the fixed 4-iteration result
    // oracle-exact; each iteration is ONE edge/rank equi-join + hash
    // aggregate — the bulk-synchronous shape that scales to
    // billion-edge graphs (partition by join key, no driver state).
    "q_pagerank" -> ((s, d) => {
      graft.ops.PageRank.run(purchaseEdges(s, d), iterations = PrIters)
        .orderBy(col("pr").desc, col("node"))
        .limit(100)
        .select(col("node"), (col("node") % 2 === 1).as("is_supplier"), col("pr"))
    }),

    // Cohort retention: users grouped by signup week, counted as
    // retained in each later week they were active. Weeks are pure
    // integer epoch arithmetic (us DIV 1d DIV 7) — no calendar
    // functions, so the matrix is exact in both engines. Shape: one
    // distinct (user, week) hash aggregate over the scan, an equi-join
    // on user_id back to the cohort frame, and a count-distinct — no
    // window, no sort, co-partitioned on user_id throughout.
    "q_cohort_retention" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"),
          expr("(unix_micros(ts) DIV 86400000000) DIV 7").as("week"))
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("week").as("cohort_week"))
      val sizes = cohorts.groupBy("cohort_week")
        .agg(countDistinct("user_id").as("n_cohort"))
      val active = ev.select("user_id", "week").distinct()
      active.join(cohorts, Seq("user_id"))
        .filter(col("week") >= col("cohort_week"))
        .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_active"))
        .join(sizes, Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"), col("n_active"), col("n_cohort"),
          expr("CAST(n_active AS DOUBLE) / n_cohort").as("retention"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Sequential conversion funnel: per user, the earliest signup, the
    // earliest view AFTER that signup, the earliest click after that
    // view, the earliest purchase after that click — strict event-order
    // attribution, not mere presence. Each stage is one filter + hash
    // aggregate + equi-join on user_id (all stages co-partitioned on
    // the same key), so the event log is scanned once per stage and
    // never sorted globally.
    "q_session_funnel" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val users = ev.select("user_id").distinct()
      val stages = FunnelStages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
        case (prev, (stage, i)) =>
          val cand = ev.filter(col("event_type") === stage)
          val gated = prev match {
            case None => cand
            case Some(p) =>
              cand.join(p.select(col("user_id"), col(s"t${i}_us")), Seq("user_id"))
                .filter(col("us") > col(s"t${i}_us"))
          }
          Some(gated.groupBy("user_id").agg(min("us").as(s"t${i + 1}_us")))
      }.flatten
      val joined = stages.foldLeft(users)(
        (acc, st) => acc.join(st, Seq("user_id"), "left"))
      val stageExpr = (FunnelStages.indices.reverse.map(i =>
        s"WHEN t${i + 1}_us IS NOT NULL THEN ${i + 1}") :+ "ELSE 0")
        .mkString("CASE ", " ", " END")
      joined
        .select(col("user_id") +: FunnelStages.indices.map(i =>
          col(s"t${i + 1}_us")) :+ expr(stageExpr).as("stage"): _*)
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> {
      val sc = graft.ops.PageRank.Scale
      val iters = (1 to PrIters).map { k =>
        s"""r$k AS (SELECT e.dst AS node,
           |  (15 * ($sc // n) + 85 * CAST(SUM(r.pr // o.outdeg) AS BIGINT)) // 100 AS pr
           |  FROM edges e JOIN r${k - 1} r ON e.src = r.node
           |  JOIN outdeg o ON e.src = o.src
           |  CROSS JOIN nc GROUP BY e.dst, n)""".stripMargin
      }.mkString(",\n")
      s"""WITH cs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM cs
         |          UNION ALL SELECT s AS src, c AS dst FROM cs),
         |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nc AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
         |r0 AS (SELECT DISTINCT src AS node, $sc // n AS pr
         |       FROM edges CROSS JOIN nc),
         |$iters
         |SELECT node, node % 2 = 1 AS is_supplier, pr
         |FROM r$PrIters ORDER BY pr DESC, node LIMIT 100""".stripMargin
    },
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, event_type,
        |    (epoch_us(ts) // 86400000000) // 7 AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |sz AS (SELECT cohort_week, COUNT(DISTINCT user_id) AS n_cohort
        |       FROM c GROUP BY cohort_week),
        |a AS (SELECT DISTINCT user_id, week FROM e),
        |r AS (SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |        COUNT(DISTINCT a.user_id) AS n_active
        |      FROM a JOIN c USING (user_id)
        |      WHERE a.week >= c.cohort_week
        |      GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active, n_cohort,
        |  CAST(n_active AS DOUBLE) / n_cohort AS retention
        |FROM r JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_session_funnel" -> {
      val stageCtes = FunnelStages.zipWithIndex.map { case (stage, i) =>
        if (i == 0)
          s"""t1 AS (SELECT user_id, MIN(us) AS t1_us FROM e
             |       WHERE event_type = '$stage' GROUP BY user_id)""".stripMargin
        else
          s"""t${i + 1} AS (SELECT e.user_id, MIN(us) AS t${i + 1}_us
             |  FROM e JOIN t$i USING (user_id)
             |  WHERE event_type = '$stage' AND us > t${i}_us
             |  GROUP BY e.user_id)""".stripMargin
      }.mkString(",\n")
      val stageCase = (FunnelStages.indices.reverse.map(i =>
        s"WHEN t${i + 1}_us IS NOT NULL THEN ${i + 1}") :+ "ELSE 0")
        .mkString("CASE ", " ", " END")
      val joins = FunnelStages.indices.map(i =>
        s"LEFT JOIN t${i + 1} USING (user_id)").mkString(" ")
      val cols = FunnelStages.indices.map(i => s"t${i + 1}_us").mkString(", ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |$stageCtes
         |SELECT user_id, $cols, $stageCase AS stage
         |FROM u $joins ORDER BY user_id""".stripMargin
    }
  )
}
