package graft

import graft.plans.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("identically-bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", Seq("l_orderkey"), 8)
    Layout.writeBucketed(o, "o_bucketed", "l_orderkey", Seq("l_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n${p.take(1500)}")
      // sanity: result matches the plain join
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("account-scoped scan of a bucketed table prunes to one bucket's files") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Layout.writeBucketed(li, "li_acct", "l_orderkey", Seq("l_orderkey"), 8)
    try {
      val q = spark.table("li_acct").filter(col("l_orderkey") === 42)
      q.collect()
      val expected = li.filter(col("l_orderkey") === 42).count()
      assert(q.count() == expected)
    } finally spark.sql("DROP TABLE IF EXISTS li_acct")
  }

  test("silver transactions bucketed by account aggregate shuffle-free") {
    // the LAYOUT.md contract wired end-to-end: ChainSim transactions
    // written via Layout.writeBucketed(account, sorted (account, lt)),
    // then an account-grouped aggregation runs with NO Exchange
    import graft.plans.{ChainSim, Layout}
    val (txs, _) = ChainSim.simulate(spark, sf)
    Layout.writeBucketed(txs.select("hash", "account", "lt", "now"),
      "txs_silver", "account", Seq("account", "lt"), 8)
    try {
      val agg = spark.table("txs_silver")
        .groupBy("account").agg(max("lt").as("last_lt"), count(lit(1)).as("n"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed groupBy must be shuffle-free:\n${p.take(1200)}")
      val expected = txs.groupBy("account").count().count()
      assert(agg.count() == expected)
    } finally spark.sql("DROP TABLE IF EXISTS txs_silver")
  }
}
