"""Driver-snapshot rotation helper (r3 verdict #7).

The driver's CORRECTNESS_r{N}.json checks only the first 50 entries of
``__spark_entry__.queries()``; rotating never-checked queries into the
non-representative prefix slots each round accumulates driver-green
evidence across rounds.  This prints the rotation state: which registered
queries have a driver row in ANY round's artifact, and which never had
one — the candidate pool for next round's prefix.

Usage: python tools/rotation_status.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            seen |= set(json.load(open(path)))
        except (OSError, ValueError):
            pass
    import __spark_entry__ as ent

    names = list(ent.queries())
    prefix = names[:50]
    never = [n for n in names if n not in seen]
    first_time = [n for n in prefix if n not in seen]
    print(f"registered: {len(names)}  driver-checked ever: "
          f"{len([n for n in names if n in seen])}  never: {len(never)}")
    print(f"current 50-slot prefix: {len(first_time)} first-time rows queued")
    for n in first_time:
        print(f"  queued : {n}")
    pool = [n for n in never if n not in prefix]
    print(f"\nrotation pool for NEXT round ({len(pool)}):")
    for n in pool:
        print(f"  pool   : {n}")


if __name__ == "__main__":
    main()
