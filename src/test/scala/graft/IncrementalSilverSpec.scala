package graft

import graft.plans.{ChainSim, IncrementalSilver}
import graft.streaming.IncrementalTraceAssembly
import graft.classifier.ClassifyJob
import graft.plans.TraceAssembly
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental silver refresh (VERDICT r10 #5): silver at N + raw rows
  * (N, M] must equal the full recompute at M — across several
  * increments, at sf0.1 — and the refresh plan must never shuffle the
  * existing silver. */
class IncrementalSilverSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def latestKey(df: DataFrame): Set[(String, Long, String, Int)] =
    df.select("account", "last_trans_lt", "last_trans_hash", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet

  test("latest-states refresh equals full recompute across 3 increments " +
      "at sf0.1, id column included") {
    val (txs, _) = ChainSim.simulate(spark, sf01)
    val cuts = txs.stat.approxQuantile("lt", Array(0.25, 0.5, 0.75), 0.0)
    val slices = Seq(
      txs.filter(col("lt") <= cuts(0)),
      txs.filter(col("lt") > cuts(0) && col("lt") <= cuts(1)),
      txs.filter(col("lt") > cuts(1) && col("lt") <= cuts(2)),
      txs.filter(col("lt") > cuts(2))).map(_.localCheckpoint())

    def fullAt(upto: Int): DataFrame =
      graft.operators.GlobalIndex.globalRowNumber(
          IncrementalSilver.latestStates(
            slices.take(upto).reduce(_ unionByName _)),
          "id", col("last_trans_lt"), col("account"))
        .withColumn("id", col("id").cast("int"))

    var silver = fullAt(1).localCheckpoint()
    for (i <- 2 to 4) {
      silver = IncrementalSilver
        .refreshLatestStates(silver, slices(i - 1)).localCheckpoint()
      assert(latestKey(silver) == latestKey(fullAt(i)),
        s"incremental diverges from full recompute after increment $i")
    }
  }

  test("the refresh plan never shuffles the existing silver: broadcast " +
      "anti/semi split, window only over the delta-sized slice") {
    val (txs, _) = ChainSim.simulate(spark, sf)
    val prev = IncrementalSilver.latestStates(txs).localCheckpoint()
    val plan = IncrementalSilver.mergeLatestStates(prev, txs.limit(50))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"delta accounts must broadcast:\n$plan")
    // the untouched branch (prev → anti join → union) must have no
    // exchange between the prev scan and the join: every Exchange in
    // the plan belongs to the delta-sized window/dedup side
    val antiIdx = plan.indexOf("LeftAnti")
    assert(antiIdx >= 0, s"expected a broadcast LEFT ANTI join:\n$plan")
    val afterAnti = plan.substring(antiIdx)
    val scanIdx = afterAnti.indexOf("Scan ExistingRDD") match {
      case -1 => afterAnti.indexOf("LocalTableScan")
      case i => i
    }
    val between = afterAnti.substring(0, math.max(scanIdx, 0))
    assert(!between.contains("Exchange hashpartitioning"),
      s"prev silver must not hash-shuffle under the anti join:\n$plan")
  }

  test("action-store refresh: reclassified store equals one-shot batch " +
      "classification, increment by increment") {
    val (txs, msgs) = ChainSim.simulate(spark, sf)
    val cut = txs.agg(expr("percentile_approx(lt, 0.5)")).head.getLong(0)
    val txs1 = txs.filter(col("lt") <= cut).localCheckpoint()
    val msgs1 = msgs.join(txs1.select(col("hash").as("tx_hash")),
      Seq("tx_hash"), "left_semi").localCheckpoint()
    val txs2 = txs.filter(col("lt") > cut).localCheckpoint()
    val msgs2 = msgs.join(txs2.select(col("hash").as("tx_hash")),
      Seq("tx_hash"), "left_semi").localCheckpoint()

    val ita = new IncrementalTraceAssembly(spark)
    val empty = spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[graft.classifier.ActionRow]).toDF()
    val store1 = IncrementalSilver
      .refreshActions(spark, empty, ita, txs1, msgs1).localCheckpoint()
    val store2 = IncrementalSilver
      .refreshActions(spark, store1, ita, txs2, msgs2).localCheckpoint()

    val (_, _, txwAll) = TraceAssembly.assemble(txs, msgs)
    val batch = ClassifyJob.run(spark, txwAll, msgs).toDF()
    def key(df: DataFrame) = df
      .select("trace_id", "action_id", "type", "start_lt", "end_lt")
      .collect().map(_.toSeq).toSet
    assert(key(store2) == key(batch),
      s"incremental action store ${store2.count()} != batch ${batch.count()}")
  }
}
