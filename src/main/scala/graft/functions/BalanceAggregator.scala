package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A7 map-merge aggregation as a typed Aggregator — the reference's
  * in-memory BalanceChanges merge (ton-index-go/index/crud/balances.go:
  * 62-135) expressed as `Aggregator[IN, BUF, OUT]` with a map buffer.
  *
  * The explode+groupBy form (SilverLayer b04) is the preferred scalable
  * shape; this Aggregator exists for the cases the reference's map-merge
  * genuinely needs — consuming whole per-trace delta sets in one typed
  * pass (e.g. inside groupByKey(trace_id).agg) without flattening, while
  * keeping exact BigInt arithmetic via string-encoded amounts.
  */
object BalanceAggregator {

  /** One delta: (account, asset or null for TON, amount as decimal string). */
  final case class Delta(account: String, asset: Option[String], amount: String)

  /** account → asset("" = TON) → summed amount (decimal string, exact). */
  type Balances = Map[String, Map[String, String]]

  val aggregator: Aggregator[Delta, Balances, Balances] =
    new Aggregator[Delta, Balances, Balances] {
      def zero: Balances = Map.empty

      def reduce(b: Balances, d: Delta): Balances = {
        val asset = d.asset.getOrElse("")
        val cur = b.getOrElse(d.account, Map.empty)
        val next = (BigInt(cur.getOrElse(asset, "0")) + BigInt(d.amount)).toString
        b.updated(d.account, cur.updated(asset, next))
      }

      def merge(x: Balances, y: Balances): Balances =
        y.foldLeft(x) { case (acc, (account, assets)) =>
          val cur = acc.getOrElse(account, Map.empty)
          val merged = assets.foldLeft(cur) { case (m, (asset, amt)) =>
            m.updated(asset, (BigInt(m.getOrElse(asset, "0")) + BigInt(amt)).toString)
          }
          acc.updated(account, merged)
        }

      def finish(b: Balances): Balances = b
      def bufferEncoder: Encoder[Balances] =
        Encoders.kryo[Balances]
      def outputEncoder: Encoder[Balances] =
        Encoders.kryo[Balances]
    }
}
