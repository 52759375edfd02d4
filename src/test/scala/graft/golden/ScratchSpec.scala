package graft.golden

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway probe for porting work — only active with GOLDEN_SCRATCH. */
class ScratchSpec extends AnyFunSuite {
  if (sys.env.contains("GOLDEN_SCRATCH") && GoldenCorpus.available) {
    test("probe") {
      import graft.classifier._
      import graft.functions.TlbDecoders
      val t = GoldenCorpus.load(sys.env("GOLDEN_SCRATCH"))
      val forest = TxTree.build(t.txs, t.msgsByTx.values.flatten.toSeq, t.msgsByTx)
      val seeded = Seeder.seedTrace(forest)
      val registry = ProtocolMatchers.registryWith(
        t.interfaces, t.jettonWallets, t.nftItems, t.walletOwners)
      val rewritten = Matching.rewrite(seeded, registry)
      def op(b: Block): String = b match {
        case c: CallContractBlock =>
          f"0x${c.opcode.map(_ & 0xffffffffL).getOrElse(-1L)}%08x"
        case _ => ""
      }
      def show(b: Block, d: Int): Unit = {
        val extra = b match {
          case c: CallContractBlock
              if c.opcode.exists(o => (o & 0xffffffffL) == 0xc0ffee21L) =>
            val amt = c.node.inMsg.flatMap(_.body).flatMap { x =>
              try Some(TlbDecoders.coffeePayoutInternal(x).amount)
              catch { case scala.util.control.NonFatal(_) => None } }
            s" payoutAmt=$amt createdLt=${c.node.inMsg.flatMap(_.createdLt)}"
          case c: CallContractBlock
              if c.opcode.exists(o => (o & 0xffffffffL) == 0xc0ffee35L) =>
            val ev = c.node.inMsg.flatMap(_.body).flatMap { x =>
              try Some(TlbDecoders.coffeeWithdrawalEvent(x))
              catch { case scala.util.control.NonFatal(_) => None } }
            s" event=$ev"
          case _ => ""
        }
        println("  " * d + s"${b.btype} ${op(b)} lt=${b.minLt} " +
          s"acct=${b.nodes.headOption.map(_.tx.account.takeRight(8)).getOrElse("-")}$extra")
        b.children.foreach(show(_, d + 1))
      }
      seeded.children.foreach(show(_, 0))
    }
  } else ignore("scratch") {}
}
