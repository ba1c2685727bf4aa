"""Ledger guard: attestation debt must be scheduled, never silent.

Round 7 proved that hand-maintained window comments rot: entries whose
implementation changed kept stale driver attestations with nothing
mechanical noticing. These tests make that state unrepresentable at
HEAD: any entry whose code fingerprint drifted from the attested one —
or that was never driver-attested, or whose attestation is flagged
stale — must sit in the driver window's first 50 slots, i.e. be
scheduled for re-attestation in the CURRENT round.

No Spark session needed: fingerprints are static AST hashes.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _ledger():
    return json.loads((REPO / "ATTESTATION.json").read_text())


def test_ledger_covers_registry_exactly():
    from tfx_addons_feast_examplegen_spark import queries as q

    ledger = _ledger()
    assert set(ledger) == set(q._REGISTRY), (
        set(ledger) ^ set(q._REGISTRY)
    )


def test_attestation_debt_is_scheduled_in_driver_window():
    from tfx_addons_feast_examplegen_spark import queries as q
    from tfx_addons_feast_examplegen_spark.attestation import (
        all_fingerprints,
    )

    ledger = _ledger()
    window = set(q._DRIVER_PRIORITY[:50])
    fps = all_fingerprints()
    unscheduled = []
    for name, row in ledger.items():
        never_attested = row["round"] is None
        known_stale = row["fingerprint"] is None and not never_attested
        drifted = (
            row["fingerprint"] is not None
            and row["fingerprint"] != fps[name]
        )
        if (never_attested or known_stale or drifted) and name not in window:
            reason = (
                "never driver-attested" if never_attested
                else "attestation flagged stale" if known_stale
                else "code changed since attestation"
            )
            unscheduled.append((name, reason))
    assert not unscheduled, (
        "entries with attestation debt missing from the driver window's "
        f"first 50 slots (rotate _DRIVER_PRIORITY or re-stamp via "
        f"scripts/gen_attestation.py): {unscheduled}"
    )


def test_fingerprints_detect_oracle_and_code_edits():
    # The detector itself must be falsifiable: perturbing either the
    # oracle SQL or any reachable function source must change the
    # fingerprint.
    from tfx_addons_feast_examplegen_spark import queries as q
    from tfx_addons_feast_examplegen_spark.attestation import (
        entry_fingerprint,
    )

    name = "pit_join"
    fn, oracle = q._REGISTRY[name]
    base = entry_fingerprint(name)
    assert base == entry_fingerprint(name)  # deterministic
    mutated = entry_fingerprint(name, {name: (fn, oracle + " -- x")})
    assert mutated != base


def test_gen_attestation_green_rows_excludes_failures(tmp_path):
    # The ledger generator must only count rows the driver actually
    # proved: err, red hash/rows/schema, and non-dict rows are all
    # excluded; weaker rows-only checks (hash_match null) still count.
    import json
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    from gen_attestation import green_rows

    p = tmp_path / "CORRECTNESS_rX.json"
    p.write_text(json.dumps({
        "good": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "schema_match": None,
                      "hash_match": None, "err": None},
        "red_hash": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "red_rows": {"rows_match": False, "schema_match": True,
                     "hash_match": True, "err": None},
        "errored": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": "boom"},
        "garbage": "not-a-dict",
    }))
    assert green_rows(p) == {"good", "rows_only"}


def test_normalized_src_resolves_pkg_init_relative_imports():
    # ADVICE r8 (low): _normalized_src must resolve relative imports the
    # way Python does for the DEFINING module — for a package __init__,
    # a level-1 import resolves against the package itself, not its
    # parent. A def in queries/__init__.py containing `from .analytics
    # import x` must fingerprint as queries.analytics, and the same
    # source must fingerprint DIFFERENTLY when attributed to a plain
    # module (where level 1 strips the module).
    import ast

    from tfx_addons_feast_examplegen_spark.attestation import (
        _normalized_src,
    )

    src = "def f():\n    from .analytics import x\n    return x"
    node = ast.parse(src).body[0]
    pkg = "tfx_addons_feast_examplegen_spark.queries"
    as_init = _normalized_src(pkg, node, is_pkg=True)
    assert "tfx_addons_feast_examplegen_spark.queries.analytics" in as_init
    as_module = _normalized_src(pkg + ".analytics", ast.parse(src).body[0])
    assert "from tfx_addons_feast_examplegen_spark.queries.analytics import x" in as_module
