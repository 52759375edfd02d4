package graft.golden

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway probe for porting work — only active with GOLDEN_SCRATCH. */
class ScratchSpec extends AnyFunSuite {
  if (sys.env.contains("GOLDEN_SCRATCH") && GoldenCorpus.available) {
    test("probe") {
      import graft.functions.TlbDecoders
      val t = GoldenCorpus.load(sys.env("GOLDEN_SCRATCH"))
      val op = sys.env.getOrElse("GOLDEN_OP", "ca444ce6")
      val target = java.lang.Long.parseLong(op, 16)
      t.msgsByTx.values.flatten.filter(
          _.opcode.exists(o => (o & 0xffffffffL) == target)).foreach { m =>
        m.body.foreach { b =>
          println(s"body full=$b")
          val s = graft.functions.Boc.parseBase64(b).beginParse()
          println(s"  bits=${s.remainingBits} refs=${s.remainingRefs}")
          s.loadUint(32)
          val amt = s.loadCoins()
          println(s"  amount=$amt remaining=${s.remainingBits}")
          try {
            val a1 = s.loadAddressExt()
            println(s"  sender=$a1 remaining=${s.remainingBits}")
            val a2 = s.loadAddressExt()
            println(s"  pegout=$a2 remaining=${s.remainingBits}")
          } catch { case e: Throwable => println(s"  ADDRFAIL: $e") }
        }
      }
    }
  } else ignore("scratch") {}
}
