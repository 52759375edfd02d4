package graft.golden

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway probe for porting work — only active with GOLDEN_SCRATCH. */
class ScratchSpec extends AnyFunSuite {
  if (sys.env.contains("GOLDEN_SCRATCH") && GoldenCorpus.available) {
    test("probe") {
      import graft.functions.TlbDecoders
      val t = GoldenCorpus.load(sys.env("GOLDEN_SCRATCH"))
      // candidate account keys the Spark traceDims feed would produce
      val txAccts = t.txs.map(_.account).toSet
      val msgEnds = t.msgsByTx.values.flatten
        .flatMap(m => m.source.toSeq ++ m.destination.toSeq).toSet
      val bodyKeys = t.msgsByTx.values.flatten.flatMap { m =>
        (m.opcode, m.body) match {
          case (Some(o), Some(b)) => TlbDecoders.resolverAddressKeys(o, b)
          case _ => Nil
        }
      }.toSet
      val candidates = txAccts ++ msgEnds ++ bodyKeys
      def report(name: String, dim: Iterable[String]): Unit = {
        val missing = dim.toSet -- candidates
        println(s"$name: ${dim.size} entries, MISSING from candidates: " +
          missing.mkString(", "))
      }
      report("interfaces", t.interfaces.keys)
      report("jettonWallets", t.jettonWallets.keys)
      report("nftItems", t.nftItems.keys)
      t.jettonWallets.foreach { case (k, v) =>
        if (!candidates.contains(k)) println(s"  missing jw $k -> master $v")
      }
      t.interfaces.foreach { case (k, v) =>
        if (!candidates.contains(k)) println(s"  missing ifc $k -> $v")
      }
    }
  } else ignore("scratch") {}
}
