package graft

import graft.operators.ActionTypes
import org.scalatest.funsuite.AnyFunSuite

/** Pins the P8 shortcut-expansion table against fixtures transcribed
  * directly from the reference's Go map
  * (ton-index-go/index/models/action_versioning.go:10-131) — every list
  * here was derived from the Go source independently of
  * [[ActionTypes.shortcuts]], so a transcription typo on either side
  * fails the comparison.
  */
class ActionTypesSpec extends AnyFunSuite {

  private val v1Expected = Seq(
    "auction_bid", "call_contract", "change_dns",
    "contract_deploy", "delete_dns", "dex_deposit_liquidity",
    "dex_withdraw_liquidity", "election_deposit", "election_recover",
    "jetton_burn", "jetton_mint", "jetton_swap",
    "jetton_transfer", "nft_mint", "nft_transfer",
    "renew_dns", "stake_deposit", "stake_withdrawal",
    "stake_withdrawal_request", "subscribe", "tick_tock",
    "ton_transfer", "unsubscribe")

  private val v2Expected = Seq(
    "auction_bid", "call_contract", "change_dns",
    "coffee_create_pool", "coffee_create_pool_creator", "coffee_create_vault",
    "coffee_mev_protect_failed_swap", "coffee_mev_protect_hold_funds",
    "coffee_staking_claim_rewards",
    "coffee_staking_deposit", "coffee_staking_withdraw", "contract_deploy",
    "delete_dns", "dex_deposit_liquidity", "dex_withdraw_liquidity",
    "election_deposit", "election_recover", "evaa_liquidate",
    "evaa_supply", "evaa_withdraw", "jetton_burn",
    "jetton_mint", "jetton_swap", "jetton_transfer",
    "jvault_claim", "jvault_stake", "jvault_unstake",
    "jvault_unstake_request", "multisig_approve", "multisig_create_order",
    "multisig_execute", "nft_discovery", "nft_mint",
    "nft_transfer", "renew_dns", "stake_deposit",
    "stake_withdrawal", "stake_withdrawal_request", "subscribe",
    "tick_tock", "ton_transfer", "tonco_deploy_pool",
    "unknown", "unsubscribe", "vesting_add_whitelist",
    "vesting_send_message")

  test("empty input still yields v1 (always-union-v1, :119)") {
    assert(ActionTypes.expand(Seq.empty) == v1Expected)
  }

  test("v2 ladder matches the transcribed fixture (46 types)") {
    assert(ActionTypes.expand(Seq("v2")) == v2Expected)
  }

  test("v1 ⊂ v2 ⊂ v3 ⊂ v4 = latest; universe has 75 concrete types") {
    val v1 = ActionTypes.expand(Seq("v1")).toSet
    val v2 = ActionTypes.expand(Seq("v2")).toSet
    val v3 = ActionTypes.expand(Seq("v3")).toSet
    val v4 = ActionTypes.expand(Seq("v4")).toSet
    assert(v1.subsetOf(v2) && v2.subsetOf(v3) && v3.subsetOf(v4))
    assert(ActionTypes.expand(Seq("latest")) == v4.toSeq.sorted)
    assert(ActionTypes.universe.size == 75)
    assert(v2.size == 46 && v3.size == 63 && v4.size == 75)
  }

  test("recursive domain groups + always-v1: tgbtc + dns.v2") {
    val expected = Seq(
      "auction_bid", "call_contract", "change_dns",
      "contract_deploy", "delete_dns", "dex_deposit_liquidity",
      "dex_withdraw_liquidity", "dns_purchase", "dns_release",
      "election_deposit", "election_recover", "jetton_burn",
      "jetton_mint", "jetton_swap", "jetton_transfer",
      "nft_mint", "nft_transfer", "renew_dns",
      "stake_deposit", "stake_withdrawal", "stake_withdrawal_request",
      "subscribe", "tgbtc_burn", "tgbtc_burn_fallback",
      "tgbtc_dkg_log_fallback", "tgbtc_mint", "tgbtc_mint_fallback",
      "tgbtc_new_key", "tgbtc_new_key_fallback", "tick_tock",
      "ton_transfer", "unsubscribe")
    assert(ActionTypes.expand(Seq("tgbtc", "dns.v2")) == expected)
  }

  test("nft.v3 resolves through nft; matches the a22 oracle list size") {
    val got = ActionTypes.expand(Seq("nft.v3", "cocoon"))
    assert(got.size == 47)
    // nft group rides in via recursion (all three already in v1 too)
    assert(Seq("nft_transfer", "nft_mint", "auction_bid",
      "nft_put_on_sale", "dns_purchase", "cocoon_worker_payout")
      .forall(got.contains))
    // layerzero is NOT reachable from this input
    assert(!got.contains("layerzero_send"))
  }

  test("unknown names pass through as concrete types (:154-156)") {
    val got = ActionTypes.expand(Seq("frobnicate"))
    assert(got.contains("frobnicate"))
    assert(v1Expected.forall(got.contains))
  }

  test("no shortcut key ever appears in an expansion") {
    val keys = ActionTypes.shortcuts.keySet
    assert(ActionTypes.universe.forall(t => !keys.contains(t)))
    assert(ActionTypes.expand(Seq("latest", "nft.v3", "dns.v2"))
      .forall(t => !keys.contains(t)))
  }

  test("cyclic synthetic table terminates via the per-branch seen guard") {
    val cyclic = Map(
      "a" -> Seq("b", "x"),
      "b" -> Seq("a", "y"))
    val got = ActionTypes.expandWith(cyclic, Seq("a"))
    // both branch payloads reached once; literal v1 passes through since
    // the synthetic table has no v1 key
    assert(got == Seq("v1", "x", "y"))
  }

  test("depth cap stops a 12-deep ladder at 10 (:135-137)") {
    val deep = (0 until 12).map(i => s"d$i" -> Seq(s"d${i + 1}")).toMap
    val got = ActionTypes.expandWith(deep, Seq("d0"))
    // d0..d10 are walks of depth 0..10; the walk into d11 would be
    // depth 11 > 10 — but d11 is a key at depth 11? d11 -> d12: the
    // recursion guard returns before emitting, so d12 never appears
    assert(!got.contains("d12"))
    assert(got.contains("v1"))
  }
}
