package graft

import org.apache.spark.sql.SparkSession

/** One-off stage profiler for the b15 pipeline (not part of the driver
  * contract). Times each stage of the heaviest bench query so
  * optimization goes after measured cost, not guesses. */
object Profile15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    SparkEntry.entry(spark).count()
    time("roots")(graft.plans.ChainSim.chainRootsPublic(spark, sfDir).count())
    val (txs, msgs) = time("protocolSimB15")(
      graft.plans.ChainSim.b15SimPublic(spark, sfDir))
    time("simCount")(msgs.count())
    val txw = time("assemble") {
      val (_, _, t) = graft.plans.TraceAssembly.assemble(
        txs, msgs, Some(graft.plans.ChainSim.chainRootsPublic(spark, sfDir)))
      t.count(); t
    }
    val dim = graft.plans.ChainSim.b15WalletDimPublic(spark, sfDir)
    time("classifyNoDims")(
      graft.classifier.ClassifyJob.run(spark, txw, msgs).toDF().count())
    time("classifyCountOnly")(
      graft.classifier.ClassifyJob.runCountProbe(spark, txw, msgs))
    time("classifyProjected")(
      graft.classifier.ClassifyJob.runProjected(spark, txw, msgs,
        graft.classifier.ClassifyDims(),
        Seq("trace_id", "type", "start_lt", "end_lt", "source",
          "destination", "success", "jetton_swap_data")).count())
    time("classifyProjectedDims")(
      graft.classifier.ClassifyJob.runProjected(spark, txw, msgs,
        graft.classifier.ClassifyDims(jettonWallets = Some(dim)),
        Seq("trace_id", "type", "start_lt", "end_lt", "source",
          "destination", "success", "jetton_swap_data")).count())
    time("classifyWithDims")(
      graft.classifier.ClassifyJob.run(spark, txw, msgs,
        graft.classifier.ClassifyDims(jettonWallets = Some(dim))).toDF().count())
    spark.stop()
  }
}
