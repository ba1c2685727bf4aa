#!/usr/bin/env python
"""Generate/refresh the ATTESTATION.json ledger.

The ledger maps every registry entry to

- ``round``: the latest driver round whose ``CORRECTNESS_r{N}.json``
  proved the entry green (``null`` = never driver-attested), and
- ``fingerprint``: the entry's static code fingerprint
  (``attestation.entry_fingerprint``) AT THE TREE THE DRIVER TESTED
  (``null`` = unknown / attestation known stale).

Workflow: run this at ROUND START, immediately after the driver's
CORRECTNESS file for the previous round lands and BEFORE making code
changes — at that moment the working tree is the tree the driver
tested, so stamping the current fingerprint is sound::

    python scripts/gen_attestation.py --stamp-round 8

Without ``--stamp-round`` the script refreshes ``round`` values from
all CORRECTNESS files but preserves recorded fingerprints.

``tests/test_attestation.py`` enforces the invariant the ledger exists
for: any entry whose current fingerprint differs from its attested one
(or that was never attested) must be scheduled in the driver window's
first 50 slots.
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tfx_addons_feast_examplegen_spark import queries as q  # noqa: E402
from tfx_addons_feast_examplegen_spark.attestation import (  # noqa: E402
    all_fingerprints,
)

LEDGER = REPO / "ATTESTATION.json"


def green_rows(path: Path) -> set[str]:
    data = json.loads(path.read_text())
    out = set()
    for name, row in data.items():
        if not isinstance(row, dict) or row.get("err"):
            continue
        if row.get("rows_match") is False or row.get("schema_match") is False:
            continue
        if row.get("hash_match") is False:
            continue
        out.add(name)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stamp-round", type=int, default=None,
                    help="stamp current fingerprints for entries green in "
                         "this round (run on the tree the driver tested)")
    args = ap.parse_args()

    last_green: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in green_rows(path):
            last_green[name] = max(last_green.get(name, 0), rnd)

    old = json.loads(LEDGER.read_text()) if LEDGER.exists() else {}
    fps = all_fingerprints()
    ledger = {}
    for name in q._REGISTRY:
        rnd = last_green.get(name)
        fp = old.get(name, {}).get("fingerprint")
        if (
            args.stamp_round is not None
            and rnd is not None
            and rnd >= args.stamp_round
        ):
            fp = fps[name]
        ledger[name] = {"round": rnd, "fingerprint": fp}

    LEDGER.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")
    n_round = sum(1 for v in ledger.values() if v["round"] is not None)
    n_fp = sum(1 for v in ledger.values() if v["fingerprint"] is not None)
    print(f"{len(ledger)} entries: {n_round} driver-attested, "
          f"{n_fp} fingerprint-stamped -> {LEDGER.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
