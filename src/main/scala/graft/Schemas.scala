package graft

import org.apache.spark.sql.types._

/** Explicit StructTypes for the blockchain data model (SURVEY.md §1;
  * reference DDL ton-index-worker/ton-index-postgres/src/migrate.cpp:115-676
  * and ORM mirror indexer/indexer/core/database.py:123-987).
  *
  * Schemas are fixed constants — never inferred — matching the reference's
  * versioned-migration discipline (§1.3). Types follow §1.2: hashes are
  * 44-char base64 strings, addresses raw `wc:HEX64` strings, token amounts
  * Decimal(38,0) (covers VarUInteger16 ≤ 2^120), clocks are long `lt` +
  * int unix `utime`, >38-digit fields (e.g. approvals_mask) are strings.
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  val amount: DataType = DecimalType(38, 0)
  val extraCurrencies: DataType = MapType(StringType, StringType)

  /** traces — migrate.cpp:515-531, database.py:188-203. */
  val traces: StructType = StructType(Seq(
    f("trace_id", StringType, nullable = false),
    f("external_hash", StringType), f("external_hash_norm", StringType),
    f("mc_seqno_start", IntegerType), f("mc_seqno_end", IntegerType),
    f("start_lt", LongType), f("end_lt", LongType),
    f("start_utime", IntegerType), f("end_utime", IntegerType),
    f("state", StringType), // complete | pending | broken
    f("pending_edges_", LongType), f("edges_", LongType), f("nodes_", LongType),
    f("classification_state", StringType))) // unclassified | failed | ok | broken

  /** trace_edges — migrate.cpp (trace_edges), TraceAssembler edge types. */
  val traceEdges: StructType = StructType(Seq(
    f("trace_id", StringType),
    f("msg_hash", StringType, nullable = false),
    f("left_tx", StringType), f("right_tx", StringType),
    f("edge_type", StringType), // ord | sys | ext | logs
    f("incomplete", BooleanType), f("broken", BooleanType)))

  /** transactions — migrate.cpp:161-232, database.py:610-711 (all phases). */
  val transactions: StructType = StructType(Seq(
    f("hash", StringType, nullable = false),
    f("account", StringType), f("lt", LongType), f("now", IntegerType),
    f("mc_block_seqno", IntegerType), f("trace_id", StringType),
    f("block_workchain", IntegerType), f("block_shard", LongType),
    f("block_seqno", IntegerType),
    f("prev_trans_hash", StringType), f("prev_trans_lt", LongType),
    f("orig_status", StringType), f("end_status", StringType),
    f("total_fees", LongType),
    f("account_state_hash_before", StringType),
    f("account_state_hash_after", StringType),
    f("descr", StringType), // ord|storage|tick_tock|split_*|merge_*
    f("aborted", BooleanType), f("destroyed", BooleanType),
    f("credit_first", BooleanType), f("is_tock", BooleanType),
    f("installed", BooleanType),
    f("storage_fees_collected", LongType), f("storage_fees_due", LongType),
    f("storage_status_change", StringType),
    f("credit_due_fees_collected", LongType), f("credit", LongType),
    f("compute_skipped", BooleanType), f("skipped_reason", StringType),
    f("compute_success", BooleanType), f("compute_msg_state_used", BooleanType),
    f("compute_account_activated", BooleanType),
    f("compute_gas_fees", LongType), f("compute_gas_used", LongType),
    f("compute_gas_limit", LongType), f("compute_gas_credit", LongType),
    f("compute_mode", IntegerType), f("compute_exit_code", IntegerType),
    f("compute_exit_arg", IntegerType), f("compute_vm_steps", LongType),
    f("compute_vm_init_state_hash", StringType),
    f("compute_vm_final_state_hash", StringType),
    f("action_success", BooleanType), f("action_valid", BooleanType),
    f("action_no_funds", BooleanType), f("action_status_change", StringType),
    f("action_total_fwd_fees", LongType), f("action_total_action_fees", LongType),
    f("action_result_code", IntegerType), f("action_result_arg", IntegerType),
    f("action_tot_actions", IntegerType), f("action_spec_actions", IntegerType),
    f("action_skipped_actions", IntegerType), f("action_msgs_created", IntegerType),
    f("action_action_list_hash", StringType),
    f("action_tot_msg_size_cells", LongType), f("action_tot_msg_size_bits", LongType),
    f("bounce", StringType), // negfunds | nofunds | ok
    f("bounce_msg_size_cells", LongType), f("bounce_msg_size_bits", LongType),
    f("bounce_req_fwd_fees", LongType), f("bounce_msg_fees", LongType),
    f("bounce_fwd_fees", LongType),
    f("split_info_cur_shard_pfx_len", IntegerType),
    f("split_info_acc_split_depth", IntegerType),
    f("split_info_this_addr", StringType), f("split_info_sibling_addr", StringType),
    f("emulated", BooleanType)))

  /** messages — migrate.cpp:236-261, database.py:725-773. Same message
    * appears twice: out of sender, in of receiver; dedup key = msg_hash. */
  val messages: StructType = StructType(Seq(
    f("msg_hash", StringType, nullable = false),
    f("tx_hash", StringType, nullable = false),
    f("tx_lt", LongType, nullable = false),
    f("direction", StringType, nullable = false), // in | out
    f("msg_hash_norm", StringType),
    f("trace_id", StringType),
    f("source", StringType), f("destination", StringType), // null ⇒ external/log
    f("value", LongType), f("value_extra_currencies", extraCurrencies),
    f("fwd_fee", LongType), f("ihr_fee", LongType), f("import_fee", LongType),
    f("created_lt", LongType), f("created_at", LongType),
    f("opcode", LongType), // signed int32 semantics, rendered 0x%08x
    f("ihr_disabled", BooleanType), f("bounce", BooleanType),
    f("bounced", BooleanType),
    f("body_hash", StringType), f("init_state_hash", StringType)))

  /** message_contents — database.py:786-790 (base64 BOC blobs). */
  val messageContents: StructType = StructType(Seq(
    f("hash", StringType, nullable = false),
    f("body", StringType)))

  /** blocks — migrate.cpp:115-150. */
  val blocks: StructType = StructType(Seq(
    f("workchain", IntegerType, nullable = false),
    f("shard", LongType, nullable = false),
    f("seqno", IntegerType, nullable = false),
    f("root_hash", StringType), f("file_hash", StringType),
    f("mc_block_workchain", IntegerType), f("mc_block_shard", LongType),
    f("mc_block_seqno", IntegerType),
    f("global_id", IntegerType), f("version", IntegerType),
    f("after_merge", BooleanType), f("before_split", BooleanType),
    f("after_split", BooleanType), f("want_merge", BooleanType),
    f("want_split", BooleanType), f("key_block", BooleanType),
    f("vert_seqno_incr", BooleanType), f("flags", IntegerType),
    f("gen_utime", LongType), f("start_lt", LongType), f("end_lt", LongType),
    f("validator_list_hash_short", IntegerType), f("gen_catchain_seqno", IntegerType),
    f("min_ref_mc_seqno", IntegerType), f("prev_key_block_seqno", IntegerType),
    f("vert_seqno", IntegerType), f("master_ref_seqno", IntegerType),
    f("rand_seed", StringType), f("created_by", StringType),
    f("tx_count", IntegerType), f("prev_blocks", StringType))) // json array

  /** latest_account_states — migrate.cpp:284-301 (upsert-by-max-lt). */
  val latestAccountStates: StructType = StructType(Seq(
    f("account", StringType, nullable = false),
    f("account_friendly", StringType),
    f("hash", StringType), f("balance", LongType),
    f("balance_extra_currencies", extraCurrencies),
    f("account_status", StringType), // uninit | frozen | active | nonexist
    f("timestamp", IntegerType),
    f("last_trans_hash", StringType), f("last_trans_lt", LongType),
    f("frozen_hash", StringType), f("data_hash", StringType),
    f("code_hash", StringType),
    f("data_boc", StringType), f("code_boc", StringType)))

  /** actions — migrate.cpp:534-586 + database.py:275-569 (nested details
    * modeled for the core action families of FIXTURES.md A.6). */
  val tonTransferDetails: StructType = StructType(Seq(
    f("content", StringType), f("encrypted", BooleanType)))

  val jettonTransferDetails: StructType = StructType(Seq(
    f("response_destination", StringType), f("forward_amount", amount),
    f("query_id", StringType), f("custom_payload", StringType),
    f("forward_payload", StringType), f("comment", StringType),
    f("is_encrypted_comment", BooleanType)))

  val nftTransferDetails: StructType = StructType(Seq(
    f("is_purchase", BooleanType), f("price", amount),
    f("query_id", StringType), f("custom_payload", StringType),
    f("forward_payload", StringType), f("forward_amount", amount),
    f("response_destination", StringType), f("nft_item_index", StringType),
    f("marketplace", StringType), f("real_prev_owner", StringType),
    f("marketplace_address", StringType), f("payout_amount", amount),
    f("payout_comment_encrypted", BooleanType),
    f("payout_comment_encoded", BooleanType),
    f("payout_comment", StringType), f("royalty_amount", amount)))

  val dexTransferDetails: StructType = StructType(Seq(
    f("amount", amount), f("asset", StringType), f("source", StringType),
    f("destination", StringType), f("source_jetton_wallet", StringType),
    f("destination_jetton_wallet", StringType)))

  val peerSwapDetails: StructType = StructType(Seq(
    f("asset_in", StringType), f("amount_in", amount),
    f("asset_out", StringType), f("amount_out", amount)))

  val jettonSwapDetails: StructType = StructType(Seq(
    f("dex", StringType), f("sender", StringType),
    f("dex_incoming_transfer", dexTransferDetails),
    f("dex_outgoing_transfer", dexTransferDetails),
    f("peer_swaps", ArrayType(peerSwapDetails)),
    f("min_out_amount", amount)))

  val stakingDetails: StructType = StructType(Seq(
    f("provider", StringType), f("ts_nft", StringType),
    f("tokens_burnt", amount), f("tokens_minted", amount)))

  /** nft_listing_details (database.py:341): getgems sale/auction listing
    * terms parsed from the sale contract's deploy state init. */
  val nftListingDetails: StructType = StructType(Seq(
    f("nft_item_index", StringType),
    f("full_price", amount), f("marketplace_fee", amount),
    f("royalty_amount", amount),
    f("marketplace_fee_address", StringType),
    f("marketplace", StringType), f("royalty_address", StringType),
    f("mp_fee_factor", amount), f("mp_fee_base", amount),
    f("royalty_fee_base", amount),
    f("max_bid", amount), f("min_bid", amount)))

  val changeDnsRecordDetails: StructType = StructType(Seq(
    f("key", StringType), f("value_schema", StringType),
    f("value", StringType), f("flags", IntegerType)))

  val multisigCreateOrderDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("order_seqno", StringType),
    f("is_created_by_signer", BooleanType),
    f("is_signed_by_creator", BooleanType),
    f("creator_index", IntegerType), f("expiration_date", LongType),
    f("order_boc", StringType)))

  val multisigApproveDetails: StructType = StructType(Seq(
    f("signer_index", IntegerType), f("exit_code", IntegerType)))

  val multisigExecuteDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("order_seqno", StringType),
    f("expiration_date", LongType), f("approvals_num", IntegerType),
    f("signers_hash", StringType), f("order_boc", StringType)))

  val vestingSendMessageDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("message_boc", StringType)))

  val vestingAddWhitelistDetails: StructType = StructType(Seq(
    f("query_id", StringType),
    f("accounts_added", ArrayType(StringType))))

  val liquidityVaultExcessDetails: StructType = StructType(Seq(
    f("asset", StringType), f("amount", amount)))

  val dexDepositLiquidityDetails: StructType = StructType(Seq(
    f("dex", StringType), f("amount1", amount), f("amount2", amount),
    f("asset1", StringType), f("asset2", StringType),
    f("user_jetton_wallet_1", StringType),
    f("user_jetton_wallet_2", StringType),
    f("lp_tokens_minted", amount),
    f("target_asset_1", StringType), f("target_asset_2", StringType),
    f("target_amount_1", amount), f("target_amount_2", amount),
    f("vault_excesses", ArrayType(liquidityVaultExcessDetails)),
    f("tick_lower", StringType), f("tick_upper", StringType),
    f("nft_index", StringType), f("nft_address", StringType)))

  val dexWithdrawLiquidityDetails: StructType = StructType(Seq(
    f("dex", StringType), f("amount1", amount), f("amount2", amount),
    f("asset1_out", StringType), f("asset2_out", StringType),
    f("user_jetton_wallet_1", StringType),
    f("user_jetton_wallet_2", StringType),
    f("dex_jetton_wallet_1", StringType),
    f("dex_jetton_wallet_2", StringType),
    f("lp_tokens_burnt", amount),
    f("dex_wallet_1", StringType), f("dex_wallet_2", StringType),
    f("is_refund", BooleanType),
    f("burned_nft_index", StringType), f("burned_nft_address", StringType),
    f("tick_lower", StringType), f("tick_upper", StringType)))

  val toncoDeployPoolDetails: StructType = StructType(Seq(
    f("jetton0_router_wallet", StringType),
    f("jetton1_router_wallet", StringType),
    f("jetton0_minter", StringType), f("jetton1_minter", StringType),
    f("tick_spacing", IntegerType), f("initial_price_x96", amount),
    f("protocol_fee", IntegerType), f("lp_fee_base", IntegerType),
    f("lp_fee_current", IntegerType), f("pool_active", BooleanType)))

  val jvaultStakeDetails: StructType = StructType(Seq(
    f("period", amount), f("minted_stake_jettons", amount),
    f("stake_wallet", StringType)))

  val jvaultClaimDetails: StructType = StructType(Seq(
    f("claimed_jettons", ArrayType(StringType)),
    f("claimed_amounts", ArrayType(amount))))

  val coffeeStakingDepositDetails: StructType = StructType(Seq(
    f("minted_item_address", StringType),
    f("minted_item_index", StringType)))

  val evaaSupplyDetails: StructType = StructType(Seq(
    f("sender_jetton_wallet", StringType),
    f("recipient_jetton_wallet", StringType),
    f("master_jetton_wallet", StringType),
    f("master", StringType), f("asset_id", StringType),
    f("is_ton", BooleanType)))

  val evaaWithdrawDetails: StructType = StructType(Seq(
    f("sender_jetton_wallet", StringType),
    f("recipient_jetton_wallet", StringType),
    f("master_jetton_wallet", StringType),
    f("master", StringType), f("fail_reason", StringType),
    f("asset_id", StringType),
    // the serializer emits is_ton (block_tree_serializer.py:705) even
    // though the reference DB composite omits it — keep the API value
    f("is_ton", BooleanType)))

  val evaaLiquidateDetails: StructType = StructType(Seq(
    f("fail_reason", StringType), f("debt_amount", amount),
    f("asset_id", StringType)))

  val cocoonQueryIdDetails: StructType = StructType(Seq(
    f("query_id", StringType)))

  val cocoonWorkerPayoutDetails: StructType = StructType(Seq(
    f("payout_type", StringType), f("query_id", StringType),
    f("new_tokens", amount), f("worker_state", IntegerType),
    f("worker_tokens", amount)))

  val cocoonChargeDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("new_tokens_used", amount),
    f("expected_address", StringType)))

  val cocoonUnregisterProxyDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("seqno", IntegerType)))

  val cocoonClientRegisterDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("nonce", StringType)))

  val cocoonChangeSecretHashDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("new_secret_hash", StringType)))

  val cocoonRequestRefundDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("via_wallet", BooleanType)))

  val cocoonIncreaseStakeDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("new_stake", amount)))

  val cocoonClientWithdrawDetails: StructType = StructType(Seq(
    f("query_id", StringType), f("withdraw_amount", amount)))

  // coffee_create_pool_details (database.py:475-483)
  val coffeeCreatePoolDetails: StructType = StructType(Seq(
    f("amount_1", amount), f("amount_2", amount),
    f("initiator_1", StringType), f("initiator_2", StringType),
    f("provided_asset", StringType), f("lp_tokens_minted", amount),
    f("pool_creator_contract", StringType)))

  // nft_mint_details / coffee_staking_withdraw_details
  // (database.py:339-340,488-492)
  val nftMintDetails: StructType = StructType(Seq(
    f("nft_item_index", StringType)))

  val coffeeStakingWithdrawDetails: StructType = StructType(Seq(
    f("nft_address", StringType), f("nft_index", StringType),
    f("points", amount)))

  // layerzero_*_details (database.py:493-518)
  val layerZeroSendDetails: StructType = StructType(Seq(
    f("send_request_id", amount), f("msglib_manager", StringType),
    f("msglib", StringType), f("uln", StringType),
    f("native_fee", amount), f("zro_fee", amount),
    f("endpoint", StringType), f("channel", StringType)))

  val layerZeroPacketDetails: StructType = StructType(Seq(
    f("src_oapp", StringType), f("dst_oapp", StringType),
    f("src_eid", IntegerType), f("dst_eid", IntegerType),
    f("nonce", amount), f("guid", StringType), f("message", StringType)))

  val layerZeroDvnVerifyDetails: StructType = StructType(Seq(
    f("nonce", amount), f("status", StringType),
    f("dvn", StringType), f("proxy", StringType),
    f("uln", StringType), f("uln_connection", StringType)))

  val actions: StructType = StructType(Seq(
    f("trace_id", StringType, nullable = false),
    f("action_id", StringType, nullable = false),
    f("type", StringType),
    f("tx_hashes", ArrayType(StringType)),
    f("value", amount), f("amount", amount),
    f("start_lt", LongType), f("end_lt", LongType),
    f("start_utime", LongType), f("end_utime", LongType),
    f("source", StringType), f("source_secondary", StringType),
    f("destination", StringType), f("destination_secondary", StringType),
    f("asset", StringType), f("asset_secondary", StringType),
    f("asset2", StringType), f("asset2_secondary", StringType),
    f("opcode", LongType), f("success", BooleanType),
    f("parent_action_id", StringType),
    f("ancestor_type", ArrayType(StringType)),
    f("value_extra_currencies", extraCurrencies),
    f("trace_end_lt", LongType), f("trace_end_utime", LongType),
    f("trace_external_hash", StringType), f("trace_mc_seqno_end", IntegerType),
    f("trace_external_hash_norm", StringType),
    f("mc_seqno_end", IntegerType),
    f("ton_transfer_data", tonTransferDetails),
    f("jetton_transfer_data", jettonTransferDetails),
    f("nft_transfer_data", nftTransferDetails),
    f("jetton_swap_data", jettonSwapDetails),
    f("staking_data", stakingDetails),
    f("nft_listing_data", nftListingDetails),
    f("change_dns_record_data", changeDnsRecordDetails),
    f("multisig_create_order_data", multisigCreateOrderDetails),
    f("multisig_approve_data", multisigApproveDetails),
    f("multisig_execute_data", multisigExecuteDetails),
    f("vesting_send_message_data", vestingSendMessageDetails),
    f("vesting_add_whitelist_data", vestingAddWhitelistDetails),
    f("dex_deposit_liquidity_data", dexDepositLiquidityDetails),
    f("dex_withdraw_liquidity_data", dexWithdrawLiquidityDetails),
    f("tonco_deploy_pool_data", toncoDeployPoolDetails),
    f("jvault_stake_data", jvaultStakeDetails),
    f("jvault_claim_data", jvaultClaimDetails),
    f("coffee_staking_deposit_data", coffeeStakingDepositDetails),
    f("evaa_supply_data", evaaSupplyDetails),
    f("evaa_withdraw_data", evaaWithdrawDetails),
    f("evaa_liquidate_data", evaaLiquidateDetails),
    f("cocoon_worker_payout_data", cocoonWorkerPayoutDetails),
    f("cocoon_proxy_payout_data", cocoonQueryIdDetails),
    f("cocoon_proxy_charge_data", cocoonChargeDetails),
    f("cocoon_client_top_up_data", cocoonQueryIdDetails),
    f("cocoon_register_proxy_data", cocoonQueryIdDetails),
    f("cocoon_unregister_proxy_data", cocoonUnregisterProxyDetails),
    f("cocoon_client_register_data", cocoonClientRegisterDetails),
    f("cocoon_client_change_secret_hash_data", cocoonChangeSecretHashDetails),
    f("cocoon_client_request_refund_data", cocoonRequestRefundDetails),
    f("cocoon_grant_refund_data", cocoonChargeDetails),
    f("cocoon_client_increase_stake_data", cocoonIncreaseStakeDetails),
    f("cocoon_client_withdraw_data", cocoonClientWithdrawDetails),
    f("layerzero_send_data", layerZeroSendDetails),
    f("layerzero_packet_data", layerZeroPacketDetails),
    f("layerzero_dvn_verify_data", layerZeroDvnVerifyDetails),
    f("nft_mint_data", nftMintDetails),
    f("coffee_staking_withdraw_data", coffeeStakingWithdrawDetails),
    f("coffee_create_pool_data", coffeeCreatePoolDetails)))

  /** action_accounts — migrate.cpp:589-599: exploded (account × action)
    * fact whose PK is the pagination sort key. */
  val actionAccounts: StructType = StructType(Seq(
    f("action_id", StringType, nullable = false),
    f("trace_id", StringType, nullable = false),
    f("account", StringType, nullable = false),
    f("trace_end_lt", LongType), f("action_end_lt", LongType),
    f("trace_end_utime", LongType), f("action_end_utime", LongType)))

  /** jetton_wallets / jetton_masters / nft_items / nft_collections —
    * migrate.cpp:310-435. TVM-derived: source inputs per SURVEY §1.35. */
  val jettonWallets: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("balance", amount),
    f("owner", StringType), f("jetton", StringType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType),
    f("mintless_is_claimed", BooleanType), f("mintless_amount", amount)))

  val jettonMasters: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("total_supply", amount),
    f("mintable", BooleanType), f("admin_address", StringType),
    f("jetton_content", StringType), f("jetton_wallet_code_hash", StringType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  val nftItems: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("init", BooleanType),
    f("index", StringType), f("collection_address", StringType),
    f("owner_address", StringType), f("content", StringType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  val nftCollections: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("next_item_index", StringType),
    f("owner_address", StringType), f("collection_content", StringType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  /** nft_transfers — migrate.cpp:336-355 (event rows, append-only). */
  val nftTransfers: StructType = StructType(Seq(
    f("tx_hash", StringType, nullable = false), f("tx_lt", LongType),
    f("tx_now", IntegerType), f("tx_aborted", BooleanType),
    f("query_id", StringType), f("nft_item_address", StringType),
    f("nft_item_index", StringType), f("nft_collection_address", StringType),
    f("old_owner", StringType), f("new_owner", StringType),
    f("response_destination", StringType), f("custom_payload", StringType),
    f("forward_amount", amount), f("forward_payload", StringType),
    f("trace_id", StringType)))

  /** jetton_transfers / jetton_burns — migrate.cpp:396-435. */
  val jettonTransfers: StructType = StructType(Seq(
    f("tx_hash", StringType, nullable = false), f("tx_lt", LongType),
    f("tx_now", IntegerType), f("tx_aborted", BooleanType),
    f("query_id", StringType), f("amount", amount),
    f("source", StringType), f("destination", StringType),
    f("jetton_wallet_address", StringType), f("jetton_master_address", StringType),
    f("response_destination", StringType), f("custom_payload", StringType),
    f("forward_ton_amount", amount), f("forward_payload", StringType),
    f("trace_id", StringType)))

  val jettonBurns: StructType = StructType(Seq(
    f("tx_hash", StringType, nullable = false), f("tx_lt", LongType),
    f("tx_now", IntegerType), f("tx_aborted", BooleanType),
    f("query_id", StringType), f("owner", StringType),
    f("jetton_wallet_address", StringType), f("jetton_master_address", StringType),
    f("amount", amount), f("response_destination", StringType),
    f("custom_payload", StringType), f("trace_id", StringType)))

  /** getgems_nft_sales / getgems_nft_auctions — migrate.cpp:437-482
    * (TVM-derived dims; the live-ownership left-join family, J8). */
  val getgemsNftSales: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("is_complete", BooleanType),
    f("created_at", IntegerType), f("marketplace_address", StringType),
    f("nft_address", StringType), f("nft_owner_address", StringType),
    f("full_price", amount), f("marketplace_fee_address", StringType),
    f("marketplace_fee", amount), f("royalty_address", StringType),
    f("royalty_amount", amount),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  val getgemsNftAuctions: StructType = StructType(Seq(
    f("address", StringType, nullable = false), f("end_flag", BooleanType),
    f("end_time", IntegerType), f("mp_addr", StringType),
    f("nft_addr", StringType), f("nft_owner", StringType),
    f("last_bid", amount), f("last_member", StringType),
    f("min_step", LongType), f("mp_fee_addr", StringType),
    f("mp_fee_factor", LongType), f("mp_fee_base", LongType),
    f("royalty_fee_addr", StringType), f("royalty_fee_factor", LongType),
    f("royalty_fee_base", LongType), f("max_bid", amount),
    f("min_bid", amount), f("created_at", IntegerType),
    f("last_bid_at", IntegerType), f("is_canceled", BooleanType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  /** multisig / multisig_orders — migrate.cpp:484-513. approvals_mask can
    * exceed Decimal(38) (256-bit) ⇒ StringType per §1.2. */
  val multisig: StructType = StructType(Seq(
    f("address", StringType, nullable = false),
    f("next_order_seqno", StringType), f("threshold", IntegerType),
    f("signers", ArrayType(StringType)), f("proposers", ArrayType(StringType)),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  val multisigOrders: StructType = StructType(Seq(
    f("address", StringType, nullable = false),
    f("multisig_address", StringType), f("order_seqno", StringType),
    f("threshold", IntegerType), f("sent_for_execution", BooleanType),
    f("approvals_mask", StringType), f("approvals_num", IntegerType),
    f("expiration_date", LongType), f("order_boc", StringType),
    f("signers", ArrayType(StringType)),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  /** dns_entries — migrate.cpp:602-612 (the W1 shortest-domain family). */
  val dnsEntries: StructType = StructType(Seq(
    f("nft_item_address", StringType, nullable = false),
    f("nft_item_owner", StringType), f("domain", StringType),
    f("dns_next_resolver", StringType), f("dns_wallet", StringType),
    f("dns_site_adnl", StringType), f("dns_storage_bag_id", StringType),
    f("last_transaction_lt", LongType)))

  /** vesting_contracts / vesting_whitelist — migrate.cpp:614-634. */
  val vestingContracts: StructType = StructType(Seq(
    f("address", StringType, nullable = false),
    f("start_time", LongType), f("total_duration", LongType),
    f("unlock_period", LongType), f("cliff_duration", LongType),
    f("total_amount", amount), f("sender_address", StringType),
    f("owner_address", StringType),
    f("last_transaction_lt", LongType),
    f("code_hash", StringType), f("data_hash", StringType)))

  val vestingWhitelist: StructType = StructType(Seq(
    f("vesting_contract_address", StringType, nullable = false),
    f("wallet_address", StringType, nullable = false)))

  /** address_metadata — migrate.cpp:676-698 (U1/J10 decoration). */
  val addressMetadata: StructType = StructType(Seq(
    f("address", StringType, nullable = false),
    f("type", StringType, nullable = false), // nft_items|nft_collections|jetton_masters
    f("valid", BooleanType), f("metadata", StringType), // json blob
    f("updated_at", IntegerType)))

  /** contract_methods — migrate.cpp:657-663 (F7 interface detection). */
  val contractMethods: StructType = StructType(Seq(
    f("code_hash", StringType, nullable = false),
    f("methods", ArrayType(LongType))))

  /** dex_pools — migrate.cpp:900-935 (classifier price lookups). */
  val dexPools: StructType = StructType(Seq(
    f("pool", StringType, nullable = false), f("platform", StringType),
    f("asset1", StringType), f("asset2", StringType),
    f("reserve1", amount), f("reserve2", amount),
    f("total_supply", amount), f("tvl_usd", DecimalType(38, 10)),
    f("tvl_ton", DecimalType(38, 10)), f("is_inited", BooleanType),
    f("last_updated", IntegerType)))
}
