package graft.functions

/** Wallet-state extraction by code hash — the reference's walletStates
  * surface (ton-index-go/index/parse/wallet_parse.go:78-114): a public
  * catalog of the standard wallet code hashes, each mapped to the data
  * layout its seqno/wallet_id/signature-flag live in.
  *
  * Layouts (wallet_parse.go:17-66):
  *   v1/v2:    seqno:uint32
  *   v3/v4:    seqno:uint32 wallet_id:uint32
  *   v5:       is_signature_allowed:bit seqno:uint32 wallet_id:uint32
  */
object WalletParse {

  final case class WalletState(
      isWallet: Boolean,
      walletType: Option[String],
      seqno: Option[Long],
      walletId: Option[Long],
      isSignatureAllowed: Option[Boolean])

  private val NotAWallet = WalletState(false, None, None, None, None)

  sealed private trait Layout
  private case object SeqnoOnly extends Layout // v1/v2
  private case object SeqnoWalletId extends Layout // v3/v4
  private case object V5 extends Layout

  /** Transcribed public catalog (wallet_parse.go:78-90). */
  val catalog: Map[String, (String, String)] = Map(
    "oM/CxIruFqJx8s/AtzgtgXVs7LEBfQd/qqs7tgL2how=" -> ("wallet v1 r1", "seqno"),
    "1JAvzJ+tdGmPqONTIgpo2g3PcuMryy657gQhfBfTBiw=" -> ("wallet v1 r2", "seqno"),
    "WHzHie/xyE9G7DeX5F/ICaFP9a4k8eDHpqmcydyQYf8=" -> ("wallet v1 r3", "seqno"),
    "XJpeaMEI4YchoHxC+ZVr+zmtd+xtYktgxXbsiO7mUyk=" -> ("wallet v2 r1", "seqno"),
    "/pUw0yQ4Uwg+8u8LTCkIwKv2+hwx6iQ6rKpb+MfXU/E=" -> ("wallet v2 r2", "seqno"),
    "thBBpYp5gLlG6PueGY48kE0keZ/6NldOpCUcQaVm9YE=" -> ("wallet v3 r1", "v3"),
    "hNr6RJ+Ypph3ibojI1gHK8D3bcRSQAKl0JGLmnXS1Zk=" -> ("wallet v3 r2", "v3"),
    "ZN1UgFUixb6KnbWc6gEFzPDQh4bKeb64y3nogKjXMi0=" -> ("wallet v4 r1", "v3"),
    "/rX/aCDi/w2Ug+fg1iyBfYRniftK5YDIeIZtlZ2r1cA=" -> ("wallet v4 r2", "v3"),
    "89fKU0k97trCizgZhqhJQDy6w9LFhHea8IEGWvCsS5M=" -> ("wallet v5 beta", "v5"),
    "IINLe3KxEhR+Gy+0V7hOdNGjDwT3N9T2KmaOlVLSty8=" -> ("wallet v5 r1", "v5"))

  private def layoutOf(tag: String): Layout = tag match {
    case "seqno" => SeqnoOnly
    case "v3" => SeqnoWalletId
    case _ => V5
  }

  /** One account state → wallet info; unknown code hash or unparseable
    * data ⇒ is_wallet=false with empty fields (the reference logs and
    * passes through, wallet_parse.go:95-105). */
  def parse(codeHash: String, dataBoc: String): WalletState = {
    if (codeHash == null || dataBoc == null) return NotAWallet
    catalog.get(codeHash) match {
      case None => NotAWallet
      case Some((name, tag)) =>
        try {
          val s = Boc.parseBase64(dataBoc).beginParse()
          layoutOf(tag) match {
            case SeqnoOnly =>
              WalletState(true, Some(name),
                Some(s.loadUint(32).toLong), None, None)
            case SeqnoWalletId =>
              WalletState(true, Some(name),
                Some(s.loadUint(32).toLong), Some(s.loadUint(32).toLong),
                None)
            case V5 =>
              val sig = s.loadBit()
              WalletState(true, Some(name),
                Some(s.loadUint(32).toLong), Some(s.loadUint(32).toLong),
                Some(sig))
          }
        } catch {
          case scala.util.control.NonFatal(_) => NotAWallet
        }
    }
  }
}
