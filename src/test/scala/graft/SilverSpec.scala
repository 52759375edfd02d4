package graft

import org.apache.spark.sql.functions._

/** The silver catalog end-to-end: materialize via graft.Silver, then
  * assert the physical reads the LAYOUT.md keys were chosen for. */
class SilverSpec extends SparkSpec {

  test("silver catalog: account page prunes to one bucket, in sorted order") {
    val counts = Silver.materialize(spark, sf, buckets = 8)
    // filter-only scans don't join/aggregate, so the planner's
    // auto-bucketed-scan heuristic would drop the bucket layout — and
    // with it the SelectedBucketsCount pruning this layout exists for
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      assert(counts("silver_transactions") > 0)
      assert(counts("silver_action_accounts") > 0)

      // /transactions?account= — single-bucket scan (the covering-index read)
      val page = spark.table("silver_transactions")
        .filter(col("account") === "0:3")
        .orderBy("account", "lt")
        .limit(50)
      page.collect()
      val plan = page.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"account filter must prune to one bucket:\n${plan.take(1200)}")

      // /actions?account= pagination — same pruning on the fact table
      val acctPage = spark.table("silver_action_accounts")
        .filter(col("account") === "0:3")
        .orderBy("account", "trace_end_lt", "trace_id", "action_end_lt",
          "action_id")
        .limit(20)
      acctPage.collect()
      val p2 = acctPage.queryExecution.executedPlan.toString
      assert(p2.contains("SelectedBucketsCount: 1 out of 8"),
        s"action_accounts page must prune to one bucket:\n${p2.take(1200)}")

      // trace-scoped action fetch groups without an exchange
      val byTrace = spark.table("silver_actions")
        .groupBy("trace_id").agg(count(lit(1)).as("n"))
      byTrace.collect()
      val p3 = byTrace.queryExecution.executedPlan.toString
      assert(!p3.contains("Exchange"),
        s"trace-bucketed action aggregate must be shuffle-free:\n${p3.take(1200)}")

      // correctness: the bucketed page equals the direct-computation page
      val (_, _, txw) = graft.plans.ChainSim.assembled(spark, sf)
      val expected = txw.filter(col("account") === "0:3")
        .orderBy("account", "lt").limit(50)
        .select("hash").collect().map(_.getString(0)).toSeq
      val got = page.select("hash").collect().map(_.getString(0)).toSeq
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      Silver.Tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
