"""Heavy-tier selection logic for the test suite.

The full suite outgrew the CI/driver verify budget (~32 min wall on
local[4]), so the slowest tests — listed in ``tests/heavy_tier.txt`` —
are deselected from the default run. To keep the tier exercised without
paying its full cost every run, each default run still executes a small
deterministic sample of it, rotated daily: over a couple of weeks every
heavy test gets re-run. Pure functions here so the policy itself is
unit-testable without spawning pytest.
"""

from __future__ import annotations

import hashlib
import os

HEAVY_SAMPLE_K = 4


def load_manifest(path: str | None = None) -> set[str]:
    """Node ids of the heavy tier (comment/blank lines ignored)."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "heavy_tier.txt")
    out: set[str] = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.add(line)
    return out


def daily_sample(node_ids: list[str], day_ordinal: int, k: int = HEAVY_SAMPLE_K) -> set[str]:
    """Deterministic k-subset for a given day.

    Ranks by md5(day:nodeid) so the sample is stable within a day,
    rotates across days, and every id recurs with period ~len/k days.
    """
    ranked = sorted(
        node_ids,
        key=lambda nid: hashlib.md5(f"{day_ordinal}:{nid}".encode()).hexdigest(),
    )
    return set(ranked[: max(0, k)])
