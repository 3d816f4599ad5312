"""Round artifacts: the committed full-registry correctness sweep
(CORRECTNESS_full_r{N}.json, produced by tools/driver_sim.py with
DRIVER_SIM_OUT) must stay parseable, green, and in sync with the
registry — the auditable backing for the 'all queries oracle-green'
claim without re-running the 6-minute sweep."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_artifact() -> str | None:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_full_r*.json"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def test_full_registry_artifact_green_and_in_sync():
    path = _latest_artifact()
    assert path, "commit a CORRECTNESS_full_r{N}.json each round (DRIVER_SIM_OUT)"
    with open(path) as fh:
        art = json.load(fh)
    s = art["summary"]
    assert s["bad"] == 0, f"committed sweep has failures: {s}"
    assert s["ok"] + s["rows_only"] == s["total"] == len(art["queries"])
    for name, status in art["queries"].items():
        assert status == "OK" or status.startswith("rows-only"), (name, status)

    # every artifact query still exists in the registry (no stale rows)
    from lime_etl_spark.plans.registry import all_queries

    registered = set(all_queries())
    stale = set(art["queries"]) - registered
    assert not stale, f"artifact names no longer registered: {sorted(stale)[:5]}"
    # and the sweep covered (at least) the whole registry at its time
    assert s["total"] >= 350
