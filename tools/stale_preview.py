#!/usr/bin/env python3
"""Window arithmetic, automated (r13 — the planning step VERDICT r12
prescribed doing by hand BEFORE committing): given engine module
paths and/or entry names you intend to touch, print exactly which
suite entries would go stale, how many urgent slots that costs, and
whether the driver's 50-row window still fits every entry whose
3-round re-verification ceiling binds this round.

The dependency map is computed with the SAME transitive-source walk
``suite._entry_hash`` uses, so the preview matches what the rotation
will actually do — no hand-maintained lists.

Usage:
  python tools/stale_preview.py operators/ranking.py operators/vocab.py
  python tools/stale_preview.py q153_curation_pipeline   # suite-side edit
  python tools/stale_preview.py                          # current stale set only
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ironman_medallion_lakehouse_spark import suite  # noqa: E402

WINDOW = 50
PKG = "ironman_medallion_lakehouse_spark"


def _module_deps() -> dict[str, set[str]]:
    """entry -> set of engine-module names its hash transits."""
    deps: dict[str, set[str]] = {}
    for name in suite.QUERIES:
        mods = set()
        for part in suite._transitive_source_parts(suite.QUERIES[name].fn):
            head = part.split(":", 1)[0]
            if "=" in head and head.split("=", 1)[0].startswith(PKG):
                mods.add(head.split("=", 1)[0])
        deps[name] = mods
    return deps


def _green_rounds() -> dict[str, int]:
    rounds: dict[str, int] = {}
    state = json.loads((ROOT / "SUITE_STATE.json").read_text())
    for name, rec in state.get("entries", {}).items():
        if isinstance(rec, dict) and rec.get("green_round"):
            rounds[name] = rec["green_round"]
    return rounds


def _latest_round() -> int:
    best = 0
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def main() -> None:
    targets = sys.argv[1:]
    suite._load_all()
    deps = _module_deps()
    rounds = _green_rounds()
    this_round = _latest_round() + 1

    # normalize targets: module paths -> dotted module names; entry
    # names pass through
    mod_targets, entry_targets = set(), set()
    for t in targets:
        if t in suite.QUERIES:
            entry_targets.add(t)
            continue
        dotted = (
            t.replace(".py", "").replace("/", ".").lstrip(".")
        )
        if not dotted.startswith(PKG):
            dotted = f"{PKG}.{dotted}"
        mod_targets.add(dotted)

    already = suite._stale_names()
    would = set(entry_targets)
    for name, mods in deps.items():
        if mods & mod_targets:
            would.add(name)
    new_stale = would - already

    # mandatory rows: anything whose last green round is ≤ this_round-3
    # (its ceiling binds NOW), plus everything already stale/new-stale
    ceiling = this_round - 3
    mandatory = {n for n, r in rounds.items() if r <= ceiling}
    urgents = already | new_stale
    need = len(mandatory | urgents)

    print(f"round about to run: r{this_round}; window {WINDOW} rows")
    if rounds and max(rounds.values()) < _latest_round():
        # gap-1 artifact (VERDICT r13 item 4): CORRECTNESS_r{N} exists
        # but SUITE_STATE still carries r{N-1} stamps, so every r{N}
        # green reads as stale and the arithmetic looks wildly OVER.
        # The ritual (tools/update_suite_state.py) must run first.
        print(
            "WARNING: SUITE_STATE is PRE-RITUAL (latest stamp "
            f"r{max(rounds.values())} < latest CORRECTNESS "
            f"r{_latest_round()}) — the numbers below overcount; run "
            "tools/update_suite_state.py first"
        )
    print(f"already stale: {len(already)}")
    if targets:
        print(f"would newly stale ({len(new_stale)}):")
        for n in sorted(new_stale):
            print(f"   {n:42s} last green r{rounds.get(n, '?')}")
    print(
        f"mandatory (ceiling r{ceiling} or older): {len(mandatory)}"
        f" — {sorted(mandatory)[:6]}{'…' if len(mandatory) > 6 else ''}"
    )
    print(f"window need = |mandatory ∪ urgent| = {need} / {WINDOW}")
    if need > WINDOW:
        over = need - WINDOW
        print(
            f"OVER by {over}: split the edit by module or defer — "
            f"{over} mandatory row(s) would slip their ceiling"
        )
        sys.exit(1)
    print(f"fits with {WINDOW - need} slot(s) spare")


if __name__ == "__main__":
    main()
