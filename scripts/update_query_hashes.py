#!/usr/bin/env python
"""Write this round's query-source fingerprint snapshot into
QUERY_HASHES.json (see queries/churn.py for why).

Run before the round's final commit so the snapshot matches the code
the driver is about to verify: a query green in round N is then known
to have been verified at exactly the fingerprints recorded under
rounds[N], and any later edit makes it "churned" and rotates it to the
front of the next driver window.

The round number defaults to max(CORRECTNESS_r*.json) + 1 — the round
whose driver run is about to happen; pass an integer argument to
override.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_analytics_engine_spark.queries import all_queries  # noqa: E402
from columnar_analytics_engine_spark.queries.churn import source_fingerprint  # noqa: E402


def current_round(root: str) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p)))
    ]
    return (max(rounds) if rounds else 0) + 1


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else current_round(root)
    path = os.path.join(root, "QUERY_HASHES.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {"rounds": {}}
    snap = {
        name: source_fingerprint(spec.fn, spec.sql)
        for name, spec in all_queries().items()
    }
    data.setdefault("rounds", {})[str(rnd)] = snap
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"QUERY_HASHES.json: wrote {len(snap)} fingerprints for round {rnd}")


if __name__ == "__main__":
    main()
