"""sf1-equivalent stage-level work drift guard (VERDICT r7 #3).

The sf0.001 profiles (tests/test_stage_profile.py) pin the bench
headliners at driver-test scale, but the bench's scale_sf1 section runs
a different corpus (50k deterministic docs) where AQE makes different
decisions — so sf0.001 pins could not adjudicate the round-7
``dedup_minhash_pairs_fast`` warm 3.43s -> 7.51s question. This suite
pins the WORK (shuffle records per exchange, broadcast rows, result
rows) of the four scale_sf1 queries on that same 50k corpus, zero
tolerance: counts are data+plan deterministic, so any mismatch is a
real plan change, never session noise.

The query definitions live in scripts/gen_stage_profiles_sf1.py and are
imported here, so the pinned thing and the checked thing cannot drift
apart. If a plan change is DELIBERATE, regenerate and say why in the
commit: python scripts/gen_stage_profiles_sf1.py
"""

from __future__ import annotations

import json
import os

import pytest

from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
from cloud_dataflow_batch_processing_spark.plans.inspect import stage_profile
from scripts.gen_stage_profiles_sf1 import sf1_profile_queries

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data",
    "stage_profile_sf1_baseline.json",
)
with open(BASELINE_PATH) as _f:
    BASELINE: dict[str, dict] = json.load(_f)


@pytest.mark.slowsweep
@pytest.mark.parametrize("name", sorted(BASELINE))
def test_sf1_work_profile_pinned(spark, name):
    """Each scale_sf1 bench query must do EXACTLY the pinned work on the
    deterministic 50k-doc corpus."""
    # Cold cache state, same reasoning as test_stage_profile.py: a
    # cached scan from an earlier test changes partial-aggregate counts.
    release_managed_caches()
    spark.catalog.clearCache()
    thunks = sf1_profile_queries(spark)
    try:
        got = stage_profile(thunks[name]())
    finally:
        release_managed_caches()
        spark.catalog.clearCache()
    want = BASELINE[name]
    assert got == want, (
        f"{name}: sf1 work profile drifted from baseline.\n"
        f"  want: {want}\n  got:  {got}\n"
        "If this plan change is deliberate, regenerate with "
        "scripts/gen_stage_profiles_sf1.py and explain in the commit."
    )
