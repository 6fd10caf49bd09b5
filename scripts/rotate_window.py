"""Compute the next driver-correctness window mechanically.

The driver emits correctness rows for the FIRST 50 registered queries
only (`registry._PRIORITY`). Each round the window should rotate onto
gates that have NEVER received a driver row. This script reads every
CORRECTNESS_r*.json in the repo root, unions the names that already
have a (green) driver row, subtracts them from the current registry,
and prints a ready-to-paste priority tuple of the never-checked names
(stable registration order, exact-oracle gates first).

Usage:
    python scripts/rotate_window.py           # print suggestion
    python scripts/rotate_window.py --verify  # also run driver_emulate
                                              # on the suggested window
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_beam_spark import registry

WINDOW = 50


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            # a hash verdict (err None) is a full check; a clean
            # `no_oracle` row is the MAXIMUM depth an oracle-less gate
            # can ever be checked to (verdict r7 item 4: these gates
            # face the driver through their exact twins; re-windowing
            # them only re-emits no_oracle forever) — count both.
            if row.get("err") is None or row.get("err") == "no_oracle":
                checked.add(name)
    qs = registry.load_all()
    never = [n for n in qs if n not in checked]
    exact = [n for n in never if qs[n].oracle]
    rows_only = [n for n in never if not qs[n].oracle]
    # the DRAINABLE backlog is the exact-oracle gates; rows-only gates
    # awaiting their one rows-only row are listed but the next window
    # should face their families with exact twins (verdict r7 item 4)
    suggestion = exact[:WINDOW]
    print(f"# registered: {len(qs)}  driver-checked(any round): {len(checked)}")
    print(f"# never-checked: {len(never)} ({len(exact)} exact, {len(rows_only)} rows-only)")
    if rows_only:
        print(f"# rows-only awaiting first row (face via exact twins): {rows_only}")
    print(f"# suggested next window ({len(suggestion)}):")
    print("_PRIORITY: tuple[str, ...] = (")
    for n in suggestion:
        print(f'    "{n}",')
    print(")")
    if "--verify" in sys.argv:
        subprocess.run(
            [sys.executable, os.path.join(root, "scripts", "driver_emulate.py"), *suggestion],
            check=False,
        )


if __name__ == "__main__":
    main()
