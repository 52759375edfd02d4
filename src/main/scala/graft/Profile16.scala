package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the round-16 optimization targets (d42,
  * d43, ann_semdedup) — not part of the driver contract. Times each
  * suspected stage so optimization goes after measured cost. */
object Profile16 {
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
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("PROFILE16_GC", "30min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).count()

    if (sys.env.get("PROFILE16_INGEST").contains("1")) {
      // replicate Bench's ingest part sequence exactly
      time("ingest.chain")(graft.plans.ChainSim.classified(spark, sfDir).count())
      graft.operators.Similarity.sharedSilverParts.foreach { case (nm, f) =>
        time(s"ingest.$nm")(f(spark, sfDir))
      }
      time("ingest.shingles")(graft.operators.Dedup.shingled(spark, sfDir).count())
      spark.stop()
      return
    }

    if (sys.env.get("PROFILE16_JACC").contains("1")) {
      import graft.operators.Dedup
      val sh = Dedup.shingled(spark, sfDir)
      time("jacc.shingled")(sh.count())
      val keyed = sh.select(col("doc_id"),
        expr("md5(cast(concat_ws('', array_sort(sh)) as binary))")
          .as("skey"))
      time("jacc.keyed+classes") {
        keyed.groupBy("skey").agg(min("doc_id").as("rep")).count()
      }
      val reps = keyed.groupBy("skey").agg(min("doc_id").as("rep"))
      val repSh = sh.join(reps.select(col("rep").as("doc_id")),
        Seq("doc_id"), "left_semi").select("doc_id", "sh")
      time("jacc.repSh")(repSh.count())
      val postings = repSh.select(col("doc_id"),
        explode(expr("transform(sh, s -> xxhash64(s))")).as("hkey"))
        .localCheckpoint()
      time("jacc.postings")(postings.count())
      time("jacc.cojoin") {
        postings.select(col("doc_id").as("doc_a"), col("hkey"))
          .join(postings.select(col("doc_id").as("doc_b"), col("hkey")),
            "hkey")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).cast("int").as("inter")).count()
      }
      time("jacc.fullSilver")(
        Dedup.repJaccardPairsSilver(spark, sfDir, 0.3).count())
      spark.stop()
      return
    }

    if (sys.env.get("PROFILE16_CLASSIFY").contains("1")) {
      time("roots")(graft.plans.ChainSim.chainRootsPublic(spark, sfDir).count())
      val (txs, msgs) = graft.plans.ChainSim.b15SimPublic(spark, sfDir)
      val (_, _, txw0) = graft.plans.TraceAssembly.assemble(
        txs, msgs, Some(graft.plans.ChainSim.chainRootsPublic(spark, sfDir)))
      val txw = txw0.localCheckpoint()
      time("joinProbe.1")(
        graft.classifier.ClassifyJob.runJoinProbe(spark, txw, msgs))
      time("joinProbe.2")(
        graft.classifier.ClassifyJob.runJoinProbe(spark, txw, msgs))
      // count() prunes the body column — noop forces EVERY msg column,
      // including the per-variant body synthesis UDF and the window
      time("msgsNoop.1")(noop(msgs))
      time("msgsNoop.2")(noop(msgs))
      time("msgsNoBodyNoop")(noop(msgs.drop("body")))
      time("txwNoop")(noop(txw))
      time("shuffleProbe.1")(
        graft.classifier.ClassifyJob.runShuffleProbe(spark, txw, msgs))
      time("shuffleProbe.2")(
        graft.classifier.ClassifyJob.runShuffleProbe(spark, txw, msgs))
      time("classifyCount.1")(
        graft.classifier.ClassifyJob.runCountProbe(spark, txw, msgs))
      time("classifyCount.2")(
        graft.classifier.ClassifyJob.runCountProbe(spark, txw, msgs))
      time("shuffleProbeChain.1")(
        graft.classifier.ClassifyJob.runShuffleProbeChain(spark, txw, msgs))
      time("shuffleProbeChain.2")(
        graft.classifier.ClassifyJob.runShuffleProbeChain(spark, txw, msgs))
      time("classifyCountChain.1")(
        graft.classifier.ClassifyJob.runCountProbeChain(spark, txw, msgs))
      time("classifyCountChain.2")(
        graft.classifier.ClassifyJob.runCountProbeChain(spark, txw, msgs))
      val dim = graft.plans.ChainSim.b15WalletDimPublic(spark, sfDir)
      val cd = graft.classifier.ClassifyDims(jettonWallets = Some(dim))
      time("traceDims.1")(
        graft.classifier.ClassifyJob.traceDimsProbe(spark, txw, msgs, cd))
      time("traceDims.2")(
        graft.classifier.ClassifyJob.traceDimsProbe(spark, txw, msgs, cd))
      spark.stop()
      return
    }

    // --- d42 stages
    val dup = graft.operators.Dedup.dupHeavyDocuments(spark, sfDir)
    time("d42.dupDocs.count")(dup.count())
    time("d42.shingles.inline")(noop(
      dup.select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text")).as("sh"))))
    time("d42.full")(SparkEntry.queries("d42_dupheavy_report")(spark, sfDir).count())
    time("d43.full")(SparkEntry.queries("d43_dupheavy_clusters")(spark, sfDir).count())

    // --- semdedup stages (shared silvers build lazily on first touch)
    val emb = Tables.embeddings(spark, sfDir)
    val n = time("emb.count")(emb.count())
    val k = graft.operators.Similarity.adaptiveK(n)
    println(s"adaptiveK = $k")
    val assign = time("semdedup.kmeansAssign(train+assign)")(
      graft.operators.Similarity.kmeansAssign(emb, k, 3).localCheckpoint())
    val hist = assign.groupBy("cluster").count()
      .orderBy(col("count").desc).collect()
    println("cluster histogram (top 10): " +
      hist.take(10).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
    val probes = time("semdedup.probeAssign")(
      graft.operators.Similarity.probeAssign(emb, assign, 3).localCheckpoint())
    val phist = probes.groupBy("cluster").count()
      .orderBy(col("count").desc).collect()
    println("probe histogram (top 10): " +
      phist.take(10).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
    println("probe rows total: " + phist.map(_.getLong(1)).sum)
    time("semdedup.pairs+cc (full)")(noop(
      graft.operators.Similarity.semanticDedupProbed(emb, probes, 0.45)))
    spark.stop()
  }
}
