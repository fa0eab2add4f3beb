"""Ordering contract of plans/registry._ordered_names.

The driver verifies a bounded prefix (~50) of ``queries()`` per round,
so the ordering IS the verification-coverage policy:

  1. never-driver-green queries first (zero evidence = highest risk),
  2. then CORE_PARITY (the reference contract),
  3. then previously-green queries, stalest green round first — so a
     regression in an old green query re-enters the verified prefix
     within a few rounds instead of hiding behind a stale green row.

Pure-Python test: ``_last_green_round`` is monkeypatched, no Spark.
"""

from __future__ import annotations

from twitter_followers_patterns_mapreduce_spark.plans import registry


def _setup(monkeypatch):
    registry._load_all()
    all_names = list(registry._REGISTRY)
    core = [n for n in registry.CORE_PARITY if n in registry._REGISTRY]
    noncore = [n for n in all_names if n not in set(registry.CORE_PARITY)]
    assert len(noncore) >= 10, "registry unexpectedly small"
    fresh = noncore[:3]          # no green evidence at all
    stale = noncore[3:6]         # green long ago (round 2)
    recent = noncore[6:]         # green last round (round 6)
    evidence = (
        {n: 2 for n in stale}
        | {n: 6 for n in recent}
        | {n: 5 for n in core}
    )
    monkeypatch.setattr(registry, "_last_green_round", lambda: evidence)
    return all_names, core, fresh, stale, recent


def test_tier_order_fresh_core_stale_recent(monkeypatch):
    all_names, core, fresh, stale, recent = _setup(monkeypatch)
    order = registry._ordered_names()
    pos = {n: i for i, n in enumerate(order)}

    # permutation of the registry, nothing dropped or duplicated
    assert sorted(order) == sorted(all_names)

    last_fresh = max(pos[n] for n in fresh)
    first_core = min(pos[n] for n in core)
    last_core = max(pos[n] for n in core)
    first_stale = min(pos[n] for n in stale)
    last_stale = max(pos[n] for n in stale)
    first_recent = min(pos[n] for n in recent)

    assert last_fresh < first_core, "never-green must precede core parity"
    assert last_core < first_stale, "core parity must precede the seen tier"
    assert last_stale < first_recent, "older green evidence must sort first"


def test_staleness_is_monotone_within_seen_tier(monkeypatch):
    _, core, fresh, stale, recent = _setup(monkeypatch)
    evidence = registry._last_green_round()
    order = registry._ordered_names()
    seen = [n for n in order if n in evidence and n not in set(registry.CORE_PARITY)]
    rounds = [evidence[n] for n in seen]
    assert rounds == sorted(rounds), "seen tier must be ordered oldest-green-first"


def test_core_parity_query_without_evidence_sorts_fresh(monkeypatch):
    all_names, core, fresh, stale, recent = _setup(monkeypatch)
    evidence = dict(registry._last_green_round())
    dropped = core[0]
    del evidence[dropped]
    monkeypatch.setattr(registry, "_last_green_round", lambda: evidence)
    order = registry._ordered_names()
    pos = {n: i for i, n in enumerate(order)}
    # with zero evidence, even a core query outranks every green one
    assert pos[dropped] < min(pos[n] for n in evidence)
