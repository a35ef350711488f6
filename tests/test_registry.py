"""Registry ordering contract.

The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()`` in iteration order (empirically verified:
CORRECTNESS_r02's 50 rows are registry indexes 0-49 of the r2 ordering).
These tests pin the certification-priority contract so a refactor can't
silently push a never-certified query back out of the sample window.
"""

from __future__ import annotations

import glob
import json
import os

from big_data_chicago_crimes_spark.plans.registry import (
    CERTIFICATION_PRIORITY,
    all_queries,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_history() -> dict[str, int]:
    """query name → last round it appeared in a CORRECTNESS_r*.json
    driver sample (regardless of outcome). Derived, not hard-coded, so
    this file never goes stale when the driver emits a new round."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name in json.load(open(path)):
            last[name] = max(last.get(name, 0), rnd)
    return last


def test_priority_names_all_registered():
    registered = set(all_queries())
    missing = [n for n in CERTIFICATION_PRIORITY if n not in registered]
    assert not missing, f"CERTIFICATION_PRIORITY names not registered: {missing}"


def test_priority_list_has_no_duplicates():
    assert len(CERTIFICATION_PRIORITY) == len(set(CERTIFICATION_PRIORITY))


def test_never_sampled_queries_inside_driver_sample_window():
    """A registered query the driver has NEVER sampled must sit inside
    the 50-entry window, or it can never earn a correctness row."""
    history = _driver_history()
    first_50 = set(list(all_queries())[:50])
    never = {n for n in all_queries() if n not in history}
    outside = never - first_50
    assert not outside, f"never-driver-sampled queries outside first 50: {outside}"


def test_no_query_goes_more_than_two_rounds_stale():
    """Staleness rotation contract (VERDICT r4 #3): with the NEXT round's
    sample = today's first 50, no query's last driver row may end up more
    than 2 rounds old. Queries already inside the window are refreshed;
    everything outside must have been sampled within the last 2 rounds."""
    history = _driver_history()
    if not history:
        return
    next_round = max(history.values()) + 1
    first_50 = set(list(all_queries())[:50])
    stale = {
        n: history[n]
        for n in all_queries()
        if n not in first_50 and n in history and next_round - history[n] > 2
    }
    assert not stale, f"queries left >2 rounds stale by current priority: {stale}"


def test_all_registered_queries_still_present():
    """Priority ordering must reorder, never drop."""
    qs = all_queries()
    assert len(qs) >= 82
    # Iteration order starts with the priority list.
    names = list(qs)
    priority_present = [n for n in CERTIFICATION_PRIORITY if n in qs]
    assert names[: len(priority_present)] == priority_present


def test_bench_tier_names_all_registered():
    """bench.py and scale_bench.py name queries as strings; a rename that
    misses a tier list would crash the driver's per-round bench run."""
    import bench
    import scale_bench

    registered = set(all_queries())
    for source, names in [
        ("bench.HEADLINE", bench.HEADLINE),
        ("bench.CERTIFICATION", bench.CERTIFICATION),
        ("bench.SENTINEL", [bench.SENTINEL]),
        ("scale_bench.SUITE", [n for qs in scale_bench.SUITE.values() for n in qs]),
    ]:
        missing = [n for n in names if n not in registered]
        assert not missing, f"{source} names not registered: {missing}"


def test_readme_counts_and_citations_track_registry():
    """README query counts rotted twice (r5: '82', r6: '84' vs actual 96)
    and once cited a deregistered query. Derive both invariants from the
    registry so they can't rot silently (VERDICT r6 #5)."""
    import re

    qs = all_queries()
    n, n_oracled = len(qs), sum(1 for q in qs.values() if q.oracle)
    readme = open(os.path.join(REPO, "README.md")).read()
    assert f"{n} registered queries" in readme, (
        f"README query count stale: registry has {n}"
    )
    assert f"({n_oracled} with DuckDB oracles" in readme, (
        f"README oracle count stale: registry has {n_oracled}"
    )
    # every backticked identifier that LOOKS like a registered-query name
    # (registered-table prefix + snake_case) must actually be registered —
    # catches citations of deregistered queries like embedding_ivf_topk
    prefixes = (
        "docs_", "events_", "orders_", "embedding_", "lineitem_",
        "customer_", "multimodal_", "purchase_", "user_",
    )
    cited = {
        c
        for c in re.findall(r"`([a-z0-9_]+)`", readme)
        if c.startswith(prefixes) and not c.endswith("_queries")
    }
    ghosts = cited - set(qs)
    assert not ghosts, f"README cites unregistered queries: {sorted(ghosts)}"
