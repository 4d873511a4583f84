"""Regenerate tests/parity_extras.py (the extra-actions tripwire snapshot).

Run deliberately after an intentional matcher change:
    cd tests && python regen_parity_extras.py
then review the diff — every changed tuple is a behavior change in which
top-level actions the classifier emits for a reference fixture.
"""

from __future__ import annotations

import pathlib
import pprint
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    from parity_harness import CASES_DIR, TRACES_DIR, load_cases

    from ton_indexer_spark.classifier.fixture_replay import replay_fixture

    snap = {}
    for yf in sorted(CASES_DIR.glob("*.yaml")):
        for name, case in load_cases(yf.name).items():
            tid = case["trace-id"]
            actions = replay_fixture(TRACES_DIR / f"{tid}.lz4")
            expected = {
                e["type"].lower() for e in case.get("expected-actions", [])
            }
            top = [a for a in actions if a.get("parent_action_id") is None]
            extra = sorted(
                (a.get("type") or "") for a in top
                if (a.get("type") or "").lower() not in expected
            )
            if extra:
                snap[(yf.name, name)] = tuple(extra)

    out = pathlib.Path(__file__).parent / "parity_extras.py"
    with open(out, "w") as f:
        f.write('"""Pinned per-fixture EXTRA top-level action types.\n\n')
        f.write("The reference's YAML cases assert only the actions under test; real\n")
        f.write("traces also carry auxiliary actions (deploys, fallback transfers,\n")
        f.write("independent protocol legs).  This snapshot pins exactly which extra\n")
        f.write("top-level types each fixture currently emits, so the parity suite\n")
        f.write("fails if the classifier starts emitting MORE actions (a matcher\n")
        f.write("regressed and stopped claiming nodes) or FEWER (a matcher started\n")
        f.write("over-claiming) — the count tripwire the round-5 verdict asked for.\n")
        f.write('Regenerate deliberately via tests/regen_parity_extras.py.\n"""\n\n')
        f.write("EXTRA_TOP_LEVEL = ")
        pprint.pprint(snap, stream=f, width=78, sort_dicts=True)
    print(f"wrote {out} ({len(snap)} cases with extras)")


if __name__ == "__main__":
    main()
