"""Golden-trace parity against the reference's own shipped fixtures.

Replays the reference's real-chain trace fixtures
(indexer/tests/traces/*.lz4 — lz4-framed msgpack, decoded by the in-repo
clean-room codec) through this engine's classifier and asserts the
reference's own YAML expectations (indexer/tests/test_cases/*.yaml) with
the same comparison semantics as its test driver
(indexer/tests/utils/generic_yaml_test.py).

Every (yaml, case) pair is parametrized.  Cases in KNOWN_GAPS are
xfail(strict) — they document matcher/decoder deltas still being closed;
the strictness means a silently-fixed case fails the suite until it is
removed from the list, so the list can only shrink.
"""

from __future__ import annotations

import pytest

from parity_harness import CASES_DIR, load_cases, run_yaml_case

# (yaml file, case name) pairs not yet at parity.  Shrink, never grow.
KNOWN_GAPS: set[tuple[str, str]] = {
    ('cocoon.yaml', 'Cocoon Worker Payout'),
    ('cocoon.yaml', 'Cocoon Worker Last Payout'),
    ('cocoon.yaml', 'Cocoon Proxy Payout'),
    ('cocoon.yaml', 'Cocoon Proxy Charge'),
    ('cocoon.yaml', 'Cocoon Client Top Up'),
    ('cocoon.yaml', 'Cocoon Register Proxy'),
    ('cocoon.yaml', 'Cocoon Unregister Proxy'),
    ('cocoon.yaml', 'Cocoon Client Register and Change Secret Hash'),
    ('cocoon.yaml', 'Cocoon Client Request Refund (Direct)'),
    ('cocoon.yaml', 'Cocoon Client Request Refund (Via Wallet)'),
    ('cocoon.yaml', 'Cocoon Grant Refund'),
    ('cocoon.yaml', 'Cocoon Client Increase Stake'),
    ('cocoon.yaml', 'Cocoon Client Withdraw'),
    ('coffee.yaml', 'Coffee DEX Swap USDT -> TON (hop) -> CES'),
    ('coffee.yaml', 'Coffee DEX Swap USDT -> TON'),
    ('coffee.yaml', 'Complicated Swap (Dedust, Coffee + Stonfi)'),
    ('coffee.yaml', 'Less complicated Swap (Dedust + Coffee)'),
    ('coffee.yaml', 'Another less complicated Swap (Stonfi + Coffee)'),
    ('coffee.yaml', 'Terrifying Swap (Stonfi, Coffee + Stonfi V2, Dedust, Stonfi V2)'),
    ('coffee.yaml', 'Coffee deposit liquidity TON + CES'),
    ('coffee.yaml', 'Coffee deposit liquidity TON + ARBUZ (with vault excess)'),
    ('coffee.yaml', 'Coffee withdraw liquidity (jetton - jetton)'),
    ('coffee.yaml', 'Coffee create pool creator (only create)'),
    ('coffee.yaml', 'Coffee create pool (full and simple)'),
    ('coffee.yaml', 'Coffee create pool (full + notification at the end)'),
    ('coffee.yaml', 'Coffee create vault'),
    ('coffee.yaml', 'Coffee mev protect hold funds (TON)'),
    ('coffee.yaml', 'Coffee staking deposit'),
    ('coffee.yaml', 'Coffee staking deposit (just another)'),
    ('coffee.yaml', 'Coffee staking withdraw'),
    ('dedust-liquidities.yaml', 'Multiple deposits with one deposit contract'),
    ('dedust-liquidities.yaml', 'Merged deposit, jetton excess'),
    ('dedust-liquidities.yaml', 'First deposit'),
    ('dedust-liquidities.yaml', 'Final deposit'),
    ('dedust-liquidities.yaml', 'Final deposit with ton excesses'),
    ('dedust-liquidities.yaml', 'Merged with ton excesses'),
    ('dedust-liquidities.yaml', 'Rejected final deposit'),
    ('dedust-liquidities.yaml', 'Merged rejected deposit'),
    ('ethena.yaml', 'Deposit'),
    ('ethena.yaml', 'Unstake request'),
    ('jvault.yaml', 'Stake (partial referral updates)'),
    ('jvault.yaml', 'Stake (simple)'),
    ('jvault.yaml', 'Stake (failed, cancellation)'),
    ('jvault.yaml', 'Stake (full referral call chain)'),
    ('jvault.yaml', 'Unstake (with referrals)'),
    ('jvault.yaml', 'Claim rewards'),
    ('jvault.yaml', 'Unstake (failed)'),
    ('jvault.yaml', 'Unstake request'),
    ('jvault.yaml', 'Unstake request (failed referral)'),
    ('jvault.yaml', 'Unstake request (success referral)'),
    ('jvault.yaml', 'Failed unstake request'),
    ('layerzero.yaml', 'LayerZero send msg to tron'),
    ('layerzero.yaml', 'LayerZero send usdt to eth'),
    ('layerzero.yaml', 'LayerZero send some test msg from ton to ton lol'),
    ('layerzero.yaml', 'LayerZero commit packet'),
    ('layerzero.yaml', 'LayerZero commit packet from eth to ton'),
    ('layerzero.yaml', 'LayerZero receive'),
    ('layerzero.yaml', 'LayerZero receive another'),
    ('nft.yaml', 'Getgems purchase'),
    ('nft.yaml', 'Fragment purchase'),
    ('nft.yaml', 'Getgems auction purchase'),
    ('nft.yaml', 'Getgems auction purchase 2'),
    ('stonfi-v2-swaps.yaml', 'Stonfi v2 Jetton -> Jetton'),
    ('stonfi-v2-swaps.yaml', 'Stonfi v2 Jetton -> Jetton multirouter'),
    ('stonfi-v2-swaps.yaml', 'Stonfi Jetton -> Ton -> Jetton'),
    ('tonstakers.yaml', 'TS Stake deposit'),
    ('tonstakers.yaml', 'TS Withdrawal request'),
    ('tonstakers.yaml', 'TS Withdrawal via nft burn'),
    ('tonstakers.yaml', 'TS Immediate Withdrawal'),
}


def _all_cases() -> list[tuple[str, str]]:
    out = []
    for yf in sorted(CASES_DIR.glob("*.yaml")):
        for name in load_cases(yf.name):
            out.append((yf.name, name))
    return out


@pytest.mark.parametrize(
    "yaml_name,case_name",
    [
        pytest.param(
            y, c,
            id=f"{y.removesuffix('.yaml')}:{c}",
            marks=(
                [pytest.mark.xfail(
                    reason="documented parity gap", strict=True)]
                if (y, c) in KNOWN_GAPS else []
            ),
        )
        for y, c in _all_cases()
    ],
)
def test_reference_golden_case(yaml_name, case_name):
    run_yaml_case(yaml_name, case_name)
