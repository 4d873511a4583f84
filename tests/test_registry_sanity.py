"""No-JVM query-registry sanity (<1 s).

A broken spec registration — an import error in a queries module, a
duplicate name, a missing oracle, a stale ``_EXPOSURE_FIRST`` entry —
previously surfaced only at driver time.  These checks run without a
SparkSession: ``all_specs()`` merely imports the query modules (builders
execute lazily), so the whole registry contract is verifiable in the
pre-commit path.
"""

from __future__ import annotations

from ton_indexer_spark.queries import _EXPOSURE_FIRST, all_specs

# specs whose semantics are deliberately non-SQL-expressible (the driver
# runs a rows-only check for these); everything else must carry an oracle
_ORACLE_EXEMPT: set[str] = set()


def test_registry_imports_and_size():
    specs = all_specs()
    assert len(specs) >= 85, f"registry shrank: {len(specs)} specs"


def test_every_spec_has_an_oracle():
    missing = [
        n for n, s in all_specs().items()
        if s.oracle is None and n not in _ORACLE_EXEMPT
    ]
    assert not missing, f"specs without oracle SQL: {missing}"


def test_every_spec_shape():
    for name, s in all_specs().items():
        assert s.name == name
        assert callable(s.builder), name
        assert s.oracle is None or (
            isinstance(s.oracle, str) and "SELECT" in s.oracle.upper()
        ), name


def test_exposure_first_names_resolve():
    """Every rotation entry must exist in the registry — a typo here
    silently shrinks the driver's sample window."""
    specs = all_specs()
    unknown = [n for n in _EXPOSURE_FIRST if n not in specs]
    assert not unknown, f"_EXPOSURE_FIRST names not registered: {unknown}"


def test_exposure_first_is_window_prefix():
    """all_specs() must actually lead with the rotation list (the driver
    samples the first 50 in registration order)."""
    names = list(all_specs())
    want = [n for n in _EXPOSURE_FIRST]
    assert names[: len(want)] == want


def test_no_duplicate_registration():
    names = list(all_specs())
    assert len(names) == len(set(names))


def test_every_action_type_has_a_driver_gate_or_coverage_note():
    """Standing guarantee from the round-8 gating pass: every action
    type the engine can emit appears in at least one registered driver
    gate (its oracle VALUES or builder source) or in the documented
    local-suite exceptions — so a new matcher cannot ship without a
    driver-facing fixture."""
    import inspect

    from ton_indexer_spark.classifier.action_versions import (
        ACTION_TYPE_SHORTCUTS,
    )
    from ton_indexer_spark.queries import classify_q

    src = inspect.getsource(classify_q)

    def expand(names, seen=None):
        seen = seen if seen is not None else set()
        for n in names:
            if n in ACTION_TYPE_SHORTCUTS:
                expand(ACTION_TYPE_SHORTCUTS[n], seen)
            else:
                seen.add(n)
        return seen

    all_types = expand(["latest", "tgbtc"])
    # covered by the local golden/parity suites rather than a driver
    # gate: synthetic sentinels and the auction/election arms whose
    # shapes the 122 reference goldens pin (tests/test_reference_parity)
    local_only = {
        "unknown",                      # sentinel, not a matcher output
        "election_deposit", "election_recover",   # goldens (elector ops)
        "auction_bid", "nft_put_on_auction",      # goldens (getgems)
        "nft_cancel_sale", "nft_purchase",        # goldens
        "nft_cancel_auction", "nft_finish_auction",  # goldens
        "nft_discovery",                # TEP-62 round trip — pytest
        "tgbtc_new_key_fallback",       # serializer suffix variant
        "tgbtc_dkg_log_fallback",       # gated as classify_remaining_arms
        "tick_tock", "contract_deploy", # structural, test_classifier
        "delete_dns", "renew_dns",      # classify_dns gate asserts via
                                        # change_dns value shapes
    }
    missing = sorted(
        t for t in all_types - local_only if f"'{t}'" not in src
    )
    assert not missing, f"action types without a driver gate: {missing}"
