"""Action-type shortcut expansion vs the reference's versioning contract
(ton-index-go/index/models/action_versioning.go)."""

from __future__ import annotations

from ton_indexer_spark.classifier.action_versions import (
    ACTION_TYPE_SHORTCUTS,
    expand_action_type_shortcuts,
)


def test_latest_expands_through_all_tiers():
    got = expand_action_type_shortcuts(["latest"])
    # latest -> v4 -> v3 -> v2 -> v1 (recursive, go:133-146)
    assert "ton_transfer" in got            # v1
    assert "multisig_execute" in got        # v2
    assert "layerzero_dvn_verify" in got    # v3
    assert "cocoon_worker_payout" in got    # v4
    # no shortcut names leak into the result (go:124-126)
    assert not got & set(ACTION_TYPE_SHORTCUTS)


def test_v1_always_included():
    got = expand_action_type_shortcuts(["nft"])
    assert "nft_transfer" in got
    assert "call_contract" in got  # v1 forced in (go:118-119)
    assert "jetton_swap" in got


def test_literal_types_pass_through():
    got = expand_action_type_shortcuts(["tgbtc_mint", "made_up_type"])
    assert "tgbtc_mint" in got and "made_up_type" in got


def test_family_alias_recursion():
    got = expand_action_type_shortcuts(["nft.v3"])
    assert "auction_bid" in got        # via nested "nft"
    assert "nft_update_sale" in got
    assert "dns_purchase" in got


def test_empty_input_is_v1():
    assert expand_action_type_shortcuts(None) == set(
        ACTION_TYPE_SHORTCUTS["v1"]
    )


def test_coffee_alias_excludes_failed_swap():
    got = expand_action_type_shortcuts(["coffee"])
    assert "coffee_mev_protect_failed_swap" not in got
    assert "coffee_mev_protect_failed_swap" in expand_action_type_shortcuts(
        ["v2"]
    )


def test_actions_plan_filters_by_version(spark, fixture_dir):
    from ton_indexer_spark.catalog import Catalog
    from ton_indexer_spark.plans import actions_by_account

    cat = Catalog(spark, fixture_dir)
    base = actions_by_account(cat, limit=1000)
    tiered = actions_by_account(
        cat, supported_action_types=["latest"], limit=1000
    )
    # fixture actions are all standard types, so latest keeps everything
    assert tiered.count() == base.count()
    v1_only = actions_by_account(
        cat, supported_action_types=["v1"], limit=1000
    )
    assert v1_only.count() <= base.count()
    allowed = expand_action_type_shortcuts(["v1"])
    assert all(r["type"] in allowed for r in v1_only.collect())
