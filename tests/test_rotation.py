"""Rotation-policy enforcement (VERDICT r9 item 6).

The driver hash-verifies only the first 50 queries() keys per round;
tools/rotation_check.py turns the stale-first ordering policy into an
assertion so new keys can never silently jump the queue again (as they
did in round 9, pushing the evidence debt past one window).

These tests need no Spark session — queries() only builds a dict of
callables.
"""

from __future__ import annotations

import pytest

from tools import rotation_check


def test_rotation_policy_holds():
    report = rotation_check.check()
    assert report["registered"] >= 190
    # every never-verified key fits in (and therefore sits in) the head
    assert report["never_verified"] <= report["window"]
    # the head must not hold evidence fresher than the stalest tail key
    if report["head_freshness"] and report["tail_stalest"] is not None:
        assert max(report["head_freshness"]) <= report["tail_stalest"]


def test_rotation_check_detects_queue_jumping(monkeypatch):
    """Reproduce the r9 failure mode: fresh keys at the head while
    stale keys sit in the tail must trip the checker."""
    import __spark_entry__ as entrymod

    real = entrymod.queries()
    latest = rotation_check.latest_evidence()
    # Build a deliberately bad ordering: freshest-first.
    bad = dict(
        sorted(real.items(), key=lambda kv: -latest.get(kv[0], 999))
    )
    monkeypatch.setattr(entrymod, "queries", lambda: bad)
    with pytest.raises(AssertionError, match="rotation violated"):
        rotation_check.check()


def test_rotation_check_requires_never_verified_in_head(monkeypatch):
    import __spark_entry__ as entrymod

    real = entrymod.queries()
    latest = rotation_check.latest_evidence()
    never = [k for k in real if k not in latest]
    if not never:
        pytest.skip("no never-verified keys registered")
    # Push one never-verified key to the very end.
    k = never[0]
    bad = {n: v for n, v in real.items() if n != k}
    bad[k] = real[k]
    monkeypatch.setattr(entrymod, "queries", lambda: bad)
    with pytest.raises(AssertionError, match="never-driver-verified"):
        rotation_check.check()


def test_changed_keys_must_be_registered(monkeypatch):
    import __spark_entry__ as entrymod

    monkeypatch.setattr(
        entrymod, "CHANGED_KEYS", ["no_such_key_xyz"], raising=False
    )
    with pytest.raises(AssertionError, match="unregistered"):
        rotation_check.check()
