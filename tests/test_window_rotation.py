"""Mechanical driver-window rotation gate.

The external CORRECTNESS gate certifies the first 50 entries of
``queries._ordered()`` each round. Rotation used to depend on a judge
escalation (rounds 5-6 shipped a stale window); this gate makes it
mechanical: if the current window overlaps the *previous* round's
CORRECTNESS file by more than half, the round forgot to rotate and the
suite fails before the driver ever runs.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from cloud_dataflow_batch_processing_spark import queries as q

REPO = Path(__file__).resolve().parent.parent
WINDOW_SIZE = 50
MAX_OVERLAP = 25


def _latest_correctness() -> tuple[str, set[str]] | None:
    files = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    if not files:
        return None
    latest = files[-1]
    return latest.name, set(json.loads(latest.read_text()).keys())


def test_driver_window_is_fifty_registered_names():
    q._load_submodule_registries()
    names = set(q.REGISTRY)
    assert len(q.DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(q.DRIVER_WINDOW)) == WINDOW_SIZE, "duplicate window names"
    missing = [n for n in q.DRIVER_WINDOW if n not in names]
    assert not missing, f"window names not in registry: {missing}"


def test_ordered_prefix_equals_driver_window():
    q._load_submodule_registries()
    prefix = [x.name for x in q._ordered()[:WINDOW_SIZE]]
    assert prefix == list(q.DRIVER_WINDOW)


def test_window_rotated_since_last_round():
    latest = _latest_correctness()
    if latest is None:
        pytest.skip("no CORRECTNESS file yet (round 1)")
    fname, prev = latest
    overlap = prev & set(q.DRIVER_WINDOW)
    assert len(overlap) <= MAX_OVERLAP, (
        f"driver window overlaps {fname} by {len(overlap)} names "
        f"(> {MAX_OVERLAP}): rotate DRIVER_WINDOW in queries.py onto "
        f"the least-recently-certified registry entries. Stale names: "
        f"{sorted(overlap)[:10]}..."
    )
