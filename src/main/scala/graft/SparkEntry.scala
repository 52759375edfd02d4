package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from operator packs; each pack entry (graft.Q)
  * co-locates the Spark program with its DuckDB oracle SQL so names and
  * column aliases stay in sync.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    operators.Relational.all ++ operators.AsOf.all ++
      operators.Events.all ++ operators.TextOps.all ++
      operators.Dedup.all ++ operators.Curation.all ++
      operators.CorpusOps.all ++ operators.Retrieval.all ++
      operators.Similarity.all ++
      operators.Multimodal.all ++ operators.ApiQueries.all ++
      plans.GraphOps.all ++ plans.ChainSim.all ++ plans.SilverLayer.all ++
      streaming.StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q12.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case Q(name, _, Some(sql), _) => name -> sql }.toMap
}
