package graft

import graft.functions.BalanceAggregator
import graft.functions.BalanceAggregator.Delta

class BalanceAggregatorSpec extends SparkSpec {

  test("typed map-merge aggregation matches explode+sum, exact beyond long") {
    import spark.implicits._
    val big = BigInt("99999999999999999999999999999999") // > Decimal(38) / 2
    val deltas = Seq(
      Delta("0:A", None, "100"), Delta("0:A", None, "-30"),
      Delta("0:A", Some("J1"), big.toString),
      Delta("0:A", Some("J1"), big.toString),
      Delta("0:B", Some("J1"), "7"))
    val ds = deltas.toDS()
    val result = ds.groupByKey(_ => "all")
      .agg(BalanceAggregator.aggregator.toColumn)
      .collect().head._2
    assert(result("0:A")("") == "70")
    assert(result("0:A")("J1") == (big * 2).toString)
    assert(result("0:B")("J1") == "7")
  }

  test("merge is associative across partitions") {
    import spark.implicits._
    val deltas = (1 to 1000).map(i => Delta(s"0:${i % 7}", None, i.toString))
    val single = deltas.foldLeft(BalanceAggregator.aggregator.zero)(
      BalanceAggregator.aggregator.reduce)
    val distributed = deltas.toDS().repartition(8)
      .groupByKey(_ => "all").agg(BalanceAggregator.aggregator.toColumn)
      .collect().head._2
    assert(single == distributed)
  }
}
