#!/usr/bin/env python3
"""Print the driver's upcoming 50-row correctness window with the
reason each entry sorted where it did — the round-planning view of
suite._ordered_names (urgent = red/stale/never-checked, then backlog
oldest-green-round first, then the attested tail).

Usage: python tools/window_preview.py [N]   (default 50)
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ironman_medallion_lakehouse_spark import suite  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    suite._load_all()
    names = suite._ordered_names()
    green = suite._latest_correctness_names() or set()
    stale = suite._stale_names()
    ever = suite._ever_checked_names()
    rounds = suite._recorded_green_rounds()
    latest_any = set(suite._latest_correctness_rows() or {})

    def reason(name: str) -> str:
        tags = []
        if name in latest_any and name not in green:
            tags.append("RED last round")
        if name in stale:
            tags.append("stale (source changed since last green)")
        if name not in ever:
            tags.append("never driver-checked")
        if not tags:
            r = rounds.get(name)
            tags.append(f"backlog, last green r{r}" if r else "backlog")
        return "; ".join(tags)

    in_window = names[:n]
    print(f"window ({len(in_window)} of {len(names)} entries):")
    for i, name in enumerate(in_window, 1):
        print(f"  {i:3d}. {name:42s} {reason(name)}")
    slipped = [m for m in names[n:] if m not in green]
    if slipped:
        print(f"\nslipping past the window this round ({len(slipped)}):")
        for m in slipped:
            print(f"       {m:42s} {reason(m)}")


if __name__ == "__main__":
    main()
