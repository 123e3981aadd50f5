"""Gate-latency budget (round-3 advice item 6): every registered key
must stay under GATE_BUDGET_S at the driver's bench shape (sf0.1), so
a future driver CORRECTNESS sample can never hit a pathological key.

The artifact is produced by `python scripts/gate_timing.py` (full
sweep, ~minutes) and committed; this test pins the bound AND the
coverage — adding a key without re-running the sweep fails here.
"""

import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ART = os.path.join(_ROOT, "GATE_TIMING.json")


@pytest.fixture(scope="module")
def artifact():
    assert os.path.exists(_ART), (
        "GATE_TIMING.json missing — run `python scripts/gate_timing.py`"
    )
    with open(_ART) as f:
        return json.load(f)


def test_every_key_within_latency_budget(artifact):
    from scripts.gate_timing import GATE_BUDGET_S

    assert not artifact["errors"], artifact["errors"]
    over = {
        k: s for k, s in artifact["timings_s"].items() if s >= GATE_BUDGET_S
    }
    assert not over, f"keys over the {GATE_BUDGET_S}s sf0.1 budget: {over}"


def test_artifact_covers_the_full_registry():
    import __spark_entry__ as entry

    with open(_ART) as f:
        art = json.load(f)
    missing = sorted(set(entry.queries()) - set(art["timings_s"]))
    assert not missing, (
        f"keys missing from GATE_TIMING.json (re-run scripts/gate_timing.py): "
        f"{missing}"
    )
