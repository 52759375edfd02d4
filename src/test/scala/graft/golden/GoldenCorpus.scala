package graft.golden

import graft.classifier.{MsgLite, NftItemInfo, TxLite}
import graft.functions.Boc

/** Loader for the reference's real golden-trace fixtures
  * (indexer/tests/traces, .lz4 — lz4-framed msgpack dumps written by
  * tests/utils/trace_deserializer.py) and adapter into the classifier's
  * input model. The interface dicts are mapped onto the same pipe-row
  * conventions the matchers consume (the Scala analogue of
  * tests/utils/repository.py's TestInterfaceRepository lookups).
  */
object GoldenCorpus {

  val TracesDir = new java.io.File("/root/reference/indexer/tests/traces")
  val CasesDir = new java.io.File("/root/reference/indexer/tests/test_cases")

  def available: Boolean = TracesDir.isDirectory && CasesDir.isDirectory

  final case class LoadedTrace(
      traceId: String,
      txs: Seq[TxLite],
      msgsByTx: Map[String, Seq[MsgLite]],
      interfaces: Map[String, String],
      jettonWallets: Map[String, String],
      nftItems: Map[String, NftItemInfo],
      walletOwners: Map[String, String] = Map.empty)

  // ---- loose-typed accessors over the msgpack value tree ----

  private def m(v: Any): Map[String, Any] =
    if (v == null) Map.empty else v.asInstanceOf[Map[String, Any]]
  private def vec(v: Any): Vector[Any] =
    if (v == null) Vector.empty else v.asInstanceOf[Vector[Any]]
  private def str(v: Any): Option[String] = Option(v).map(_.toString)
  private def long(v: Any): Option[Long] = v match {
    case null => None
    case l: Long => Some(l)
    case l: java.lang.Long => Some(l)
    case d: Double => Some(d.toLong)
    case d: java.lang.Double => Some(d.longValue)
    case b: BigInt => Some(b.longValue)
    case s: String => scala.util.Try(s.toLong).toOption
    case other => scala.util.Try(other.toString.toDouble.toLong).toOption
  }
  private def bigdec(v: Any): Option[BigDecimal] = v match {
    case null => None
    case l: Long => Some(BigDecimal(l))
    case l: java.lang.Long => Some(BigDecimal(l.longValue))
    case d: java.lang.Double => Some(BigDecimal(java.math.BigDecimal.valueOf(d.doubleValue)))
    case d: Double => Some(BigDecimal(java.math.BigDecimal.valueOf(d)))
    case b: BigInt => Some(BigDecimal(b))
    case s: String => scala.util.Try(BigDecimal(s)).toOption
    case _ => None
  }
  private def bool(v: Any): Boolean = v match {
    case b: java.lang.Boolean => b.booleanValue
    case b: Boolean => b
    case _ => false
  }
  /** balances/prices are float64 in the dumps (the reference packed its
    * Decimal columns through float) — render as a whole-number string. */
  private def numStr(v: Any): Option[String] =
    bigdec(v).map(_.toBigInt.toString)

  def load(traceId: String): LoadedTrace = {
    val f = new java.io.File(TracesDir, traceId + ".lz4")
    require(f.exists, s"trace fixture missing: $f")
    val root = m(MsgPack.unpackLz4File(f))

    val txDicts = vec(root("transactions")).map(m)
    val txs = txDicts.map { t =>
      TxLite(
        hash = str(t("hash")).get,
        account = str(t("account")).get,
        lt = long(t("lt")).getOrElse(0L),
        now = long(t("now")).getOrElse(0L).toInt,
        origStatus = str(t.getOrElse("orig_status", null)).getOrElse("active"),
        endStatus = str(t.getOrElse("end_status", null)).getOrElse("active"),
        aborted = bool(t.getOrElse("aborted", null)),
        computeExitCode = long(t.getOrElse("compute_exit_code", null)).map(_.toInt),
        actionResultCode = long(t.getOrElse("action_result_code", null)).map(_.toInt),
        totalFees = long(t.getOrElse("total_fees", null)).getOrElse(0L),
        descr = str(t.getOrElse("descr", null)).getOrElse("ord"),
        mcSeqno = long(t.getOrElse("mc_block_seqno", null)).map(_.toInt))
    }

    val msgsByTx: Map[String, Seq[MsgLite]] = txDicts.map { t =>
      val txHash = str(t("hash")).get
      val msgs = vec(t.getOrElse("messages", null)).map(m).zipWithIndex
        .map { case (mm, i) =>
        MsgLite(
          msgHash = str(mm("msg_hash")).get,
          direction = str(mm("direction")).getOrElse("in"),
          source = str(mm.getOrElse("source", null)),
          destination = str(mm.getOrElse("destination", null)),
          value = long(mm.getOrElse("value", null)).getOrElse(0L),
          opcode = long(mm.getOrElse("opcode", null)),
          bounce = bool(mm.getOrElse("bounce", null)),
          bounced = bool(mm.getOrElse("bounced", null)),
          createdLt = long(mm.getOrElse("created_lt", null)),
          body = str(m(mm.getOrElse("message_content", null))
            .getOrElse("body", null)),
          initState = str(m(mm.getOrElse("init_state", null))
            .getOrElse("body", null)),
          createdAt = long(mm.getOrElse("created_at", null)),
          // dump order — the reference tree's children follow
          // tx.messages verbatim (to_tree, tree_utils.py:107-116)
          seqNo = Some(i))
      }
      txHash -> (msgs: Seq[MsgLite])
    }.toMap

    val ifcDicts: Map[String, Map[String, Any]] =
      m(root.getOrElse("interfaces", null)).map { case (acct, d) => acct -> m(d) }

    val jettonWallets: Map[String, String] = ifcDicts.collect {
      case (acct, d) if d.contains("JettonWallet") =>
        acct -> str(m(d("JettonWallet")).getOrElse("jetton", null)).getOrElse("")
    }

    val walletOwners: Map[String, String] = ifcDicts.collect {
      case (acct, d) if d.contains("JettonWallet") =>
        acct -> str(m(d("JettonWallet")).getOrElse("owner", null)).getOrElse("")
    }

    val nftItems: Map[String, NftItemInfo] = ifcDicts.collect {
      case (acct, d) if d.contains("NftItem") =>
        val it = m(d("NftItem"))
        acct -> NftItemInfo(
          index = numStr(it.getOrElse("index", null)),
          collection = str(it.getOrElse("collection_address", null)))
    }

    // pipe-row interface map per the matcher conventions (Matchers.scala
    // ifaceOf / NftPurchaseMatcher / JvaultUnstakeFull):
    val interfaces = Map.newBuilder[String, String]
    ifcDicts.foreach { case (acct, d) =>
      d.foreach {
        case ("JettonWallet", data) =>
          val jetton = str(m(data).getOrElse("jetton", null)).getOrElse("")
          if (graft.classifier.ProtocolMatchers.PtonMasters.contains(jetton))
            interfaces += acct -> "pton_wallet"
        case ("NftItem", _) =>
          interfaces += acct -> "nft_item"
        case ("NftSale", data) =>
          val s = m(data)
          interfaces += acct -> Seq("nft_sale",
            str(s.getOrElse("nft_owner_address", null)).getOrElse(""),
            str(s.getOrElse("marketplace_address", null)).getOrElse(""),
            str(s.getOrElse("nft_address", null)).getOrElse(""),
            numStr(s.getOrElse("full_price", null)).getOrElse("")).mkString("|")
        case ("NftAuction", data) =>
          val a = m(data)
          interfaces += acct -> Seq("nft_auction",
            str(a.getOrElse("nft_owner", null)).getOrElse(""),
            str(a.getOrElse("mp_addr", null)).getOrElse(""),
            str(a.getOrElse("nft_addr", null)).getOrElse(""),
            numStr(a.getOrElse("last_bid", null)).getOrElse("")).mkString("|")
        case _ => ()
      }
    }

    // jvault stake wallets: data_boc holds (staking_pool, minter); the
    // pool's own data_boc holds lock_wallet_address whose JettonWallet
    // row gives the staked asset (blocks/jvault.py:45-66)
    ifcDicts.foreach { case (acct, d) =>
      d.get("data_boc").map(m).foreach { extra =>
        str(extra.getOrElse("data_boc", null)).foreach { b64 =>
          try {
            val s = Boc.parseBase64(b64).beginParse()
            (s.loadAddress(), s.loadAddress()) match {
              case (Some(pool), Some(minter)) =>
                val lockWallet = ifcDicts.get(pool).flatMap(_.get("data_boc"))
                  .map(m).flatMap(e => str(e.getOrElse("lock_wallet_address", null)))
                val asset = lockWallet.flatMap(jettonWallets.get)
                if (asset.isDefined || ifcDicts.contains(pool))
                  interfaces += acct -> Seq("jvault_stake_wallet", pool,
                    asset.getOrElse(minter), minter).mkString("|")
              case _ => ()
            }
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }

    LoadedTrace(str(m(root("trace"))("trace_id")).get, txs, msgsByTx,
      interfaces.result(), jettonWallets, nftItems, walletOwners)
  }

  /** Run the production classifier over a loaded trace. */
  def classify(t: LoadedTrace): Seq[graft.classifier.ActionRow] =
    graft.classifier.Classifier.classify(t.traceId, t.txs, t.msgsByTx,
      interfaces = t.interfaces, jettonWallets = t.jettonWallets,
      nftItems = t.nftItems, walletOwners = t.walletOwners)
}
