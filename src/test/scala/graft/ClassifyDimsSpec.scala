package graft

import graft.classifier._

/** The DataFrame-dims classify feed (SURVEY §2.9 G6): per-trace dim maps
  * pre-joined and cogrouped into the classifier must reproduce exactly
  * what the global-map registry path produces — including for traces
  * with no dim hits (resolver-bound-with-misses semantics). */
class ClassifyDimsSpec extends SparkSpec {

  private val nftOp = Opcodes.NftTransfer
  private val jtOp = Opcodes.JettonTransfer
  private val jtiOp = Opcodes.JettonInternalTransfer

  // three traces: an NFT transfer with a dim hit, one without, and a
  // two-wallet jetton transfer whose sender wallet resolves to a master
  private def txRows = Seq(
    ("trA", "TA1", "0:I1", 10L, 10),
    ("trB", "TB1", "0:I2", 20L, 20),
    ("trC", "TC1", "0:W1", 30L, 30),
    ("trC", "TC2", "0:W2", 31L, 31))

  private def txDf = {
    import spark.implicits._
    txRows.map { case (tr, h, a, lt, now) =>
      (tr, h, a, lt, now, "active", "active", false,
        Option.empty[Int], Option.empty[Int], 0L, "ord") }
      .toDF("trace_id", "hash", "account", "lt", "now", "orig_status",
        "end_status", "aborted", "compute_exit_code", "action_result_code",
        "total_fees", "descr")
  }

  private def msgRows = Seq(
    ("ma1", "TA1", "in", Some("0:U1"), Some("0:I1"), 100L, Some(nftOp), 1L),
    ("mb1", "TB1", "in", Some("0:U2"), Some("0:I2"), 100L, Some(nftOp), 2L),
    ("mc1", "TC1", "in", Some("0:U3"), Some("0:W1"), 100L, Some(jtOp), 3L),
    ("mc2", "TC1", "out", Some("0:W1"), Some("0:W2"), 50L, Some(jtiOp), 4L),
    ("mc2", "TC2", "in", Some("0:W1"), Some("0:W2"), 50L, Some(jtiOp), 4L))

  private def txLite(hash: String, account: String, lt: Long): TxLite =
    TxLite(hash, account, lt, lt.toInt, "active", "active", false,
      None, None, 0L, "ord")

  private def msgLite(t: (String, String, String, Option[String],
      Option[String], Long, Option[Long], Long)): MsgLite =
    MsgLite(t._1, t._3, t._4, t._5, t._6, t._7, bounce = false,
      bounced = false, Some(t._8), None)

  private val ifaceMap = Map("0:I1" -> "nft_item")
  private val jwMap = Map("0:W1" -> "0:MA", "0:W2" -> "0:MA", "0:ZZ" -> "0:MZ")
  private val nftMap = Map("0:I1" -> NftItemInfo(Some("42"), Some("0:C1")))

  test("DataFrame-dims cogroup path matches the global-map registry path") {
    import spark.implicits._
    val txs = txDf
    val msgs = msgRows.toDF("msg_hash", "tx_hash", "direction", "source",
      "destination", "value", "opcode", "created_lt")
      .withColumn("bounce", org.apache.spark.sql.functions.lit(false))
      .withColumn("bounced", org.apache.spark.sql.functions.lit(false))

    val ifDim = ifaceMap.toSeq.toDF("account", "interface")
    val jwDim = jwMap.toSeq.toDF("account", "master")
    val nftDim = nftMap.toSeq.map { case (a, i) =>
      (a, i.index.orNull, i.collection.orNull) }
      .toDF("account", "item_index", "collection")

    val viaDims = ClassifyJob.run(spark, txs, msgs,
      ClassifyDims(Some(ifDim), Some(jwDim), Some(nftDim))).collect().toSet

    // oracle: the map path, per trace, with the full global maps
    val byTrace = txRows.groupBy(_._1)
    val msgsOf = msgRows.groupBy(_._2)
    val expected = byTrace.flatMap { case (traceId, rs) =>
      val txsOf = rs.map(r => txLite(r._2, r._3, r._4))
      val msgsByTx = rs.map(_._2)
        .map(h => h -> msgsOf.getOrElse(h, Nil).map(msgLite))
        .filter(_._2.nonEmpty).toMap
      Classifier.classify(traceId, txsOf, msgsByTx,
        ifaceMap, jwMap, nftMap)
    }.toSet
    assert(viaDims == expected)

    // the dim values actually landed: index/collection from nft dim,
    // master from the jetton dim
    val nft = viaDims.filter(_.`type` == "nft_transfer")
    assert(nft.size == 2)
    val withDim = nft.find(_.trace_id == "trA").get
    assert(withDim.nft_transfer_data.flatMap(_.nft_item_index) == Some("42"))
    assert(withDim.asset.contains("0:C1"))
    val withoutDim = nft.find(_.trace_id == "trB").get
    assert(withoutDim.nft_transfer_data.flatMap(_.nft_item_index).isEmpty)
    val jt = viaDims.find(_.`type` == "jetton_transfer").get
    assert(jt.asset.contains("0:MA"))
  }

  test("persisted body_keys column reproduces the inline decode path " +
      "exactly (ingest decode-once hook)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Boc
    // give the jetton transfer a REAL TEP-74 body whose decode yields an
    // address key ("0:77..77") the msg endpoints never mention — the
    // dims branch must deliver that wallet's dim row through body_keys
    val keyAddr = "0:" + "77" * 32
    val bodyB64 = Boc.serializeBase64(new Boc.Builder()
      .storeUint(BigInt(Opcodes.JettonTransfer), 32)
      .storeUint(BigInt(1), 64)
      .storeCoins(BigInt(42))
      .storeAddress(Some(keyAddr)).storeAddress(None)
      .storeBit(false).storeCoins(BigInt(0)).storeBit(false)
      .storeUint(BigInt(0), 32).storeBytes("hi".getBytes("UTF-8"))
      .build())
    val txs = txDf
    val msgs = msgRows.toDF("msg_hash", "tx_hash", "direction", "source",
      "destination", "value", "opcode", "created_lt")
      .withColumn("bounce", lit(false)).withColumn("bounced", lit(false))
      .withColumn("body",
        when(col("msg_hash") === "mc1", lit(bodyB64)))
    // the decode actually extracts the planted key (non-vacuous check)
    assert(graft.functions.TlbDecoders
      .resolverAddressKeys(Opcodes.JettonTransfer, bodyB64)
      .contains(keyAddr))
    val ifDim = ifaceMap.toSeq.toDF("account", "interface")
    val jwDim = (jwMap + (keyAddr -> "0:MK")).toSeq.toDF("account", "master")
    val nftDim = nftMap.toSeq.map { case (a, i) =>
      (a, i.index.orNull, i.collection.orNull) }
      .toDF("account", "item_index", "collection")
    val dims = ClassifyDims(Some(ifDim), Some(jwDim), Some(nftDim))
    val inline = ClassifyJob.run(spark, txs, msgs, dims).collect().toSet
    // persisted form: keys precomputed at "ingest" with the public column
    val persisted = ClassifyJob.run(spark, txs,
      msgs.withColumn("body_keys",
        ClassifyJob.bodyKeysCol(col("opcode"), col("body"))),
      dims).collect().toSet
    assert(persisted == inline)
    // a null body_keys row must behave like an EMPTY key list, not drop
    // the row's endpoint candidates (the coalesce guard in traceDims:
    // concat(endpoints, null) is null, and the explode would silently
    // erase the message's source/destination from the dim reach)
    val nullKeys = ClassifyJob.run(spark, txs,
      msgs.withColumn("body_keys", lit(null).cast("array<string>")),
      dims).collect().toSet
    val emptyKeys = ClassifyJob.run(spark, txs,
      msgs.withColumn("body_keys", array().cast("array<string>")),
      dims).collect().toSet
    assert(nullKeys == emptyKeys)
    // and endpoint-derived dims still land on the null-keys path: the
    // original jetton transfer (wallets 0:W1/0:W2) resolves its master
    assert(nullKeys.find(_.`type` == "jetton_transfer")
      .exists(_.asset.contains("0:MA")))
  }

  test("no-dims fast path is unchanged") {
    import spark.implicits._
    val txs = txDf
    val msgs = msgRows.toDF("msg_hash", "tx_hash", "direction", "source",
      "destination", "value", "opcode", "created_lt")
      .withColumn("bounce", org.apache.spark.sql.functions.lit(false))
      .withColumn("bounced", org.apache.spark.sql.functions.lit(false))
    val bare = ClassifyJob.run(spark, txs, msgs).collect()
    assert(bare.count(_.`type` == "nft_transfer") == 2)
    // without dims the jetton transfer still classifies, asset unresolved
    val jt = bare.find(_.`type` == "jetton_transfer").get
    assert(jt.asset.isEmpty || !jt.asset.contains("0:MA"))
  }
}
