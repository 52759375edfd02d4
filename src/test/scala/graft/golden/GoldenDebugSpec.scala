package graft.golden

import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc inspection of one golden trace (set GOLDEN_DEBUG_TRACE to the
  * trace id). Prints the tx tree with opcodes and the classified actions
  * — a scratch tool for porting work, not a correctness gate. */
class GoldenDebugSpec extends AnyFunSuite {

  private val target = sys.env.get("GOLDEN_DEBUG_TRACE")

  if (target.isDefined && GoldenCorpus.available) {
    test(s"debug ${target.get}") {
      val t = GoldenCorpus.load(target.get)
      val msgs = t.msgsByTx
      def op(o: Option[Long]): String =
        o.map(v => f"0x${v & 0xffffffffL}%08x").getOrElse("-")
      val forest = graft.classifier.TxTree.build(
        t.txs, msgs.values.flatten.toSeq, msgs)
      def show(n: graft.classifier.TxNode, d: Int): Unit = {
        val in = n.inMsg
        println("  " * d +
          s"tx=${n.tx.hash.take(12)} acct=${n.tx.account.takeRight(8)} lt=${n.tx.lt} " +
          s"op=${op(in.flatMap(_.opcode))} val=${in.map(_.value).getOrElse(0L)} " +
          s"aborted=${n.tx.aborted} exit=${n.tx.computeExitCode} " +
          s"body=${in.flatMap(_.body).map(_.take(16)).getOrElse("-")}")
        n.children.foreach(show(_, d + 1))
      }
      forest.foreach(show(_, 0))
      println("--- interfaces ---")
      t.interfaces.foreach { case (k, v) => println(s"  ${k.takeRight(10)} -> $v") }
      println(s"  jettonWallets=${t.jettonWallets.size} nftItems=${t.nftItems.size}")
      println("--- actions ---")
      GoldenCorpus.classify(t).foreach { a =>
        println(s"  ${a.`type`} src=${a.source} dst=${a.destination} " +
          s"amount=${a.amount} value=${a.value} success=${a.success} " +
          s"txs=${a.tx_hashes.size} accounts=${a.accounts.size}")
      }
    }
  } else ignore("set GOLDEN_DEBUG_TRACE to inspect a trace") {}
}
