package graft

/** Temporary stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (txs, msgs) = time("simulate+materialize") {
      val (t, m) = graft.plans.ChainSim.simulate(spark, dir)
      (t.localCheckpoint(), m.localCheckpoint())
    }
    println(s"txs=${txs.count()} msgs=${msgs.count()}")
    val (_, _, txw) = time("assemble") {
      val r = graft.plans.TraceAssembly.assemble(txs, msgs)
      (r._1.localCheckpoint(), r._2, r._3.localCheckpoint())
    }
    val acts = time("classify") {
      graft.classifier.ClassifyJob.run(spark, txw, msgs).toDF().localCheckpoint()
    }
    println(s"actions=${acts.count()}")
    time("a03-query-only") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("trace_id")
      val withEnds = acts.withColumn("trace_end_utime", max("end_utime").over(w))
      graft.operators.QueryLayer.actions(withEnds,
        Seq("call_contract", "contract_deploy"), 100).count()
    }
    time("forestRoots-events(g01-path)") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val edges = graft.Tables.events(spark, dir)
        .withColumn("parent", lag(col("event_id"), 1).over(w))
        .select(col("event_id").as("id"), col("parent"))
      graft.plans.GraphOps.forestRoots(edges).count()
    }
    spark.stop()
  }
}
