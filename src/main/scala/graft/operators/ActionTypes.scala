package graft.operators

/** P8 first half — the `supported_action_types` shortcut expansion the
  * reference applies BEFORE the hierarchical suppression filter
  * (ton-index-go/index/models/action_versioning.go:10-131). Every
  * `/api/v3/actions?supported_action_types=v2` request runs through this:
  * shortcut names (version ladders `v1..v4`/`latest`, domain groups like
  * `staking`/`jettons`/`nft.v3`) resolve recursively to concrete action
  * types, unknown names pass through as literal types, and the result is
  * always unioned with `v1` (action_versioning.go:119 — old clients keep
  * seeing the base vocabulary).
  *
  * Expansion is a driver-side, O(table-size) computation producing the
  * `Seq[String]` that [[QueryLayer.actions]] turns into an `isin` filter +
  * `arrays_overlap` suppression — so at cluster scale this is a constant
  * folded into the scan predicate, never a join.
  */
object ActionTypes {

  /** action_versioning.go:3-8. */
  val basicActions: Seq[String] =
    Seq("call_contract", "contract_deploy", "tick_tock", "ton_transfer")

  /** Transcription of `ActionTypeShortcuts` (action_versioning.go:10-115).
    * Values may themselves be shortcut names (`v3` contains `v2`,
    * `nft.v3` contains `nft`) — resolution is recursive.
    */
  val shortcuts: Map[String, Seq[String]] = Map(
    "v1" -> Seq(
      "call_contract", "contract_deploy", "ton_transfer", "stake_deposit",
      "stake_withdrawal", "stake_withdrawal_request", "dex_deposit_liquidity",
      "jetton_transfer", "nft_transfer", "nft_mint", "jetton_burn",
      "jetton_mint", "jetton_swap", "change_dns", "delete_dns", "renew_dns",
      "subscribe", "dex_withdraw_liquidity", "unsubscribe",
      "election_deposit", "election_recover", "auction_bid", "tick_tock"),
    "v2" -> (Seq(
      "call_contract", "contract_deploy", "ton_transfer", "stake_deposit",
      "stake_withdrawal", "stake_withdrawal_request", "dex_deposit_liquidity",
      "jetton_transfer", "nft_transfer", "nft_mint", "jetton_burn",
      "jetton_mint", "jetton_swap", "change_dns", "delete_dns", "renew_dns",
      "subscribe", "dex_withdraw_liquidity", "unsubscribe",
      "election_deposit", "election_recover", "auction_bid", "tick_tock")
      ++ Seq(
      "multisig_create_order", "multisig_approve", "multisig_execute",
      "vesting_send_message", "vesting_add_whitelist",
      "evaa_supply", "evaa_withdraw", "evaa_liquidate",
      "jvault_stake", "jvault_unstake", "jvault_claim",
      "jvault_unstake_request",
      "nft_discovery",
      "tonco_deploy_pool",
      "coffee_create_vault", "coffee_create_pool_creator",
      "coffee_create_pool", "coffee_mev_protect_hold_funds",
      "coffee_mev_protect_failed_swap", "coffee_staking_claim_rewards",
      "coffee_staking_deposit", "coffee_staking_withdraw",
      "unknown")),
    "v3" -> Seq(
      "v2",
      "nft_put_on_sale", "nft_put_on_auction", "auction_outbid",
      "nft_cancel_sale", "nft_purchase", "nft_cancel_auction",
      "nft_finish_auction", "teleitem_start_auction",
      "teleitem_cancel_auction", "nft_update_sale",
      "dns_purchase", "dns_release",
      "layerzero_send", "layerzero_send_tokens", "layerzero_receive",
      "layerzero_commit_packet", "layerzero_dvn_verify"),
    "v4" -> Seq(
      "v3",
      "cocoon_worker_payout", "cocoon_proxy_payout", "cocoon_proxy_charge",
      "cocoon_client_top_up", "cocoon_register_proxy",
      "cocoon_unregister_proxy", "cocoon_client_register",
      "cocoon_client_change_secret_hash", "cocoon_client_request_refund",
      "cocoon_grant_refund", "cocoon_client_increase_stake",
      "cocoon_client_withdraw"),
    "latest" -> Seq("v4"),
    "staking" -> Seq(
      "stake_deposit", "stake_withdrawal", "stake_withdrawal_request"),
    "jettons" -> Seq("jetton_transfer", "jetton_burn", "jetton_mint"),
    "nft" -> Seq("nft_transfer", "nft_mint", "auction_bid"),
    "nft.v3" -> Seq(
      "nft", "nft_put_on_sale", "nft_put_on_auction", "auction_outbid",
      "nft_cancel_sale", "nft_purchase", "nft_cancel_auction",
      "nft_finish_auction", "teleitem_start_auction",
      "teleitem_cancel_auction", "nft_update_sale",
      "dns_purchase", "dns_release"),
    "dns" -> Seq(
      "change_dns", "delete_dns", "renew_dns", "dns_purchase",
      "dns_release"),
    "dns.v2" -> Seq("dns", "dns_purchase", "dns_release"),
    "multisig" -> Seq(
      "multisig_create_order", "multisig_approve", "multisig_execute"),
    "vesting" -> Seq("vesting_send_message", "vesting_add_whitelist"),
    "evaa" -> Seq("evaa_supply", "evaa_withdraw", "evaa_liquidate"),
    "jvault" -> Seq(
      "jvault_stake", "jvault_unstake", "jvault_claim",
      "jvault_unstake_request"),
    "coffee" -> Seq(
      "coffee_create_vault", "coffee_create_pool_creator",
      "coffee_create_pool", "coffee_mev_protect_hold_funds",
      "coffee_staking_claim_rewards", "coffee_staking_deposit",
      "coffee_staking_withdraw"),
    "tgbtc" -> Seq(
      "tgbtc_dkg_log_fallback",
      "tgbtc_new_key", "tgbtc_new_key_fallback",
      "tgbtc_burn", "tgbtc_burn_fallback",
      "tgbtc_mint", "tgbtc_mint_fallback"),
    "layerzero" -> Seq(
      "layerzero_send", "layerzero_send_tokens", "layerzero_receive",
      "layerzero_commit_packet", "layerzero_dvn_verify"),
    "cocoon" -> Seq(
      "cocoon_worker_payout", "cocoon_proxy_payout", "cocoon_proxy_charge",
      "cocoon_client_top_up", "cocoon_register_proxy",
      "cocoon_unregister_proxy", "cocoon_client_register",
      "cocoon_client_change_secret_hash", "cocoon_client_request_refund",
      "cocoon_grant_refund", "cocoon_client_increase_stake",
      "cocoon_client_withdraw"))

  private val MaxDepth = 10

  /** `ExpandActionTypeShortcuts` (action_versioning.go:108-131): resolve
    * each input recursively, always union `v1`, keep only concrete types
    * (names that are themselves shortcut keys never appear in the
    * output). Result sorted so the driver-side constant is deterministic.
    */
  def expand(input: Seq[String]): Seq[String] =
    expandWith(shortcuts, input)

  /** Table-parameterized walk — lets the spec pin the cycle/depth guards
    * with a synthetic cyclic table. */
  private[graft] def expandWith(table: Map[String, Seq[String]],
      input: Seq[String]): Seq[String] = {
    val out = collection.mutable.Set[String]()
    // per-branch cycle guard, mirroring the seen-map mark/unmark walk
    // (action_versioning.go:133-160)
    def walk(name: String, seen: Set[String], depth: Int): Unit = {
      if (depth > MaxDepth || seen(name)) return
      table.get(name) match {
        case Some(children) =>
          children.foreach { c =>
            if (table.contains(c)) walk(c, seen + name, depth + 1)
            else out += c
          }
        case None => out += name // concrete action type, passes through
      }
    }
    input.foreach(walk(_, Set.empty, 0))
    walk("v1", Set.empty, 0) // always-∪-v1 (action_versioning.go:119)
    out.toSeq.sorted
  }

  /** Every concrete type reachable from `latest` — the engine's current
    * action-type universe (75 types at the transcription point).
    */
  val universe: Seq[String] = expand(Seq("latest"))
}
