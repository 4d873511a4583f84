"""Action-type versioning: the `supported_action_types` request surface.

Clients pin the action vocabulary they understand via shortcuts ("v1",
"latest", "nft.v3", or the X-Actions-Version header); the API expands
them to concrete type lists before filtering (reference:
ton-index-go/index/models/action_versioning.go:3-131, used by /actions,
/traces and the pending routes, main.go:1352-1357 / :1496-1500).

The shortcut table below is the reference's published API contract
(action_versioning.go:10-110) — version tiers v1-v4 plus family aliases.
Expansion semantics mirror ExpandActionTypeShortcuts exactly:

* shortcuts expand recursively (e.g. "latest" -> "v4" -> "v3" -> ...),
  depth-capped at 10 to break cycles;
* unknown names pass through as literal action types;
* the v1 vocabulary is ALWAYS included (action_versioning.go:118-119),
  so a client asking only for "nft" still receives the basic actions.
"""

from __future__ import annotations

_V1 = [
    "call_contract", "contract_deploy", "ton_transfer", "stake_deposit",
    "stake_withdrawal", "stake_withdrawal_request", "dex_deposit_liquidity",
    "jetton_transfer", "nft_transfer", "nft_mint", "jetton_burn",
    "jetton_mint", "jetton_swap", "change_dns", "delete_dns", "renew_dns",
    "subscribe", "dex_withdraw_liquidity", "unsubscribe",
    "election_deposit", "election_recover", "auction_bid", "tick_tock",
]

_V2_NEW = [
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
    "unknown",
]

_NFT_V3_NEW = [
    "nft_put_on_sale", "nft_put_on_auction", "auction_outbid",
    "nft_cancel_sale", "nft_purchase", "nft_cancel_auction",
    "nft_finish_auction", "teleitem_start_auction",
    "teleitem_cancel_auction", "nft_update_sale",
    "dns_purchase", "dns_release",
]

_LAYERZERO = [
    "layerzero_send", "layerzero_send_tokens", "layerzero_receive",
    "layerzero_commit_packet", "layerzero_dvn_verify",
]

_COCOON = [
    "cocoon_worker_payout", "cocoon_proxy_payout", "cocoon_proxy_charge",
    "cocoon_client_top_up", "cocoon_register_proxy",
    "cocoon_unregister_proxy", "cocoon_client_register",
    "cocoon_client_change_secret_hash", "cocoon_client_request_refund",
    "cocoon_grant_refund", "cocoon_client_increase_stake",
    "cocoon_client_withdraw",
]

ACTION_TYPE_SHORTCUTS: dict[str, list[str]] = {
    "v1": _V1,
    "v2": _V1 + _V2_NEW,
    "v3": ["v2", *_NFT_V3_NEW, *_LAYERZERO],
    "v4": ["v3", *_COCOON],
    "latest": ["v4"],
    "staking": ["stake_deposit", "stake_withdrawal",
                "stake_withdrawal_request"],
    "jettons": ["jetton_transfer", "jetton_burn", "jetton_mint"],
    "nft": ["nft_transfer", "nft_mint", "auction_bid"],
    "nft.v3": ["nft", *_NFT_V3_NEW],
    "dns": ["change_dns", "delete_dns", "renew_dns", "dns_purchase",
            "dns_release"],
    "dns.v2": ["dns", "dns_purchase", "dns_release"],
    "multisig": ["multisig_create_order", "multisig_approve",
                 "multisig_execute"],
    "vesting": ["vesting_send_message", "vesting_add_whitelist"],
    "evaa": ["evaa_supply", "evaa_withdraw", "evaa_liquidate"],
    "jvault": ["jvault_stake", "jvault_unstake", "jvault_claim",
               "jvault_unstake_request"],
    # the family alias deliberately omits coffee_mev_protect_failed_swap
    # (action_versioning.go:90-94) — present only in the v2+ tiers
    "coffee": ["coffee_create_vault", "coffee_create_pool_creator",
               "coffee_create_pool", "coffee_mev_protect_hold_funds",
               "coffee_staking_claim_rewards", "coffee_staking_deposit",
               "coffee_staking_withdraw"],
    "tgbtc": ["tgbtc_dkg_log_fallback", "tgbtc_new_key",
              "tgbtc_new_key_fallback", "tgbtc_burn",
              "tgbtc_burn_fallback", "tgbtc_mint", "tgbtc_mint_fallback"],
    "layerzero": _LAYERZERO,
    "cocoon": _COCOON,
}

_MAX_DEPTH = 10


def _expand(name: str, out: set[str], seen: set[str], depth: int) -> None:
    if depth > _MAX_DEPTH:
        return
    if name in seen:
        return
    seen.add(name)
    members = ACTION_TYPE_SHORTCUTS.get(name)
    if members is None:
        out.add(name)  # literal action type
        return
    for m in members:
        _expand(m, out, seen, depth + 1)


def expand_action_type_shortcuts(shortcuts: list[str] | None) -> set[str]:
    """Shortcuts/literals → the concrete action-type set, v1 always in."""
    out: set[str] = set()
    seen: set[str] = set()
    for s in shortcuts or []:
        _expand(s, out, seen, 0)
    _expand("v1", out, set(), 0)  # always include v1 (go:118-119)
    return out
