package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale (SURVEY §4:
  * "Skewed keys → salting or AQE skew-join"). AQE handles skewed
  * sort-merge joins automatically; these cover the two cases it doesn't:
  * a skewed aggregation and a skewed broadcast-ineligible join.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt)
    * first so one hot key spreads over `saltBuckets` reducers, then
    * finalize per key. Only ASSOCIATIVE aggregates may use this —
    * sum/count/min/max — which is why the API takes them explicitly. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"), count(lit(1)).as("partial_n"))
      .groupBy("key")
      .agg(sum("partial").as("total"), sum("partial_n").as("n"))
  }

  /** Salted join of a skewed fact against a small-but-not-broadcastable
    * dim: replicate each dim row `saltBuckets` times, salt the fact side
    * deterministically, join on (key, salt) — the hot key's rows land on
    * `saltBuckets` different reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
