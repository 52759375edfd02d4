package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen, parquet footers) outside any timing
    SparkEntry.entry(spark).count()
    // base silver ingest, timed as its own phase: the shared sim/assembly/
    // classified tables every query family reads are an INGEST cost in any
    // real deployment (materialized once at load), so it reports as one
    // explicit line instead of inflating whichever query touches it first.
    // Variant-specific silver (per-protocol b-family pipelines) still
    // builds inside its query's timing.
    val tIngest0 = System.nanoTime()
    try {
      graft.plans.ChainSim.classified(spark, sfDir).count()
      ()
    } catch { case _: Throwable => () }
    val ingest = (System.nanoTime() - tIngest0) / 1e9
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = (("ingest_silver" -> ingest) +: results)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ingest + results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
