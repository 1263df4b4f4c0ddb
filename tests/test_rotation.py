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
    # — except in the just-recorded state check() already tolerates
    # (VERDICT r10 finding #1: re-asserting the raw inequality here
    # made the suite go red the moment the driver wrote CORRECTNESS):
    if (
        not report["just_recorded"]
        and report["head_freshness"]
        and report["tail_stalest"] is not None
    ):
        assert max(report["head_freshness"]) <= report["tail_stalest"]


def test_rotation_check_detects_queue_jumping(monkeypatch):
    """Reproduce the r9 failure mode: fresh keys at the head while
    stale keys sit in the tail must trip the checker.

    Evidence is SYNTHESIZED (round 12): deriving the bad ordering from
    the repo's real CORRECTNESS files made this negative test
    state-dependent — immediately after the driver records a round,
    the 50 freshest keys ARE the just-verified window, so a
    freshest-first ordering becomes indistinguishable from the benign
    just-recorded state check() rightly tolerates, and the expected
    raise never fired. A fixed fresh/stale split (49 fresh + the rest
    stale) keeps the head mixed, which the tolerance never covers."""
    import __spark_entry__ as entrymod

    real = entrymod.queries()
    keys = list(real)
    fake_latest = {k: 9 if i < 49 else 5 for i, k in enumerate(keys)}
    monkeypatch.setattr(
        rotation_check, "latest_evidence", lambda repo=None: fake_latest
    )
    # hermetic: CHANGED_KEYS are exempt from the staleness assert, so
    # a real changed key landing in the synthetic head would mask the
    # violation this test exists to detect
    monkeypatch.setattr(entrymod, "CHANGED_KEYS", [])
    # Deliberately bad ordering: freshest-first — the 50-key head gets
    # 49 r9 keys plus one r5 key, while r5 keys sit in the tail.
    bad = dict(
        sorted(real.items(), key=lambda kv: -fake_latest[kv[0]])
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


def test_rotation_tolerates_just_recorded_window(monkeypatch):
    """After the driver records a round, the head is by definition
    the freshest evidence — that exact state must not trip the
    checker (the r11 session would otherwise start red before its
    rotation commit)."""
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries().keys())
    head, tail = keys[:50], keys[50:]
    real = rotation_check.latest_evidence()
    simulated = dict(real)
    for k in head:
        simulated[k] = 99  # everything in the window just verified
    monkeypatch.setattr(
        rotation_check, "latest_evidence", lambda repo=None: simulated
    )
    report = rotation_check.check()
    assert report["head_freshness"] == [99]

    # ...but a queue-jumped ordering in that same state (a
    # never-verified key inserted into the head, displacing a stale
    # key to the tail) must still fail: swap a tail never-verified
    # key with the last head key.
    never_tail = [k for k in tail if k not in simulated]
    if never_tail:
        jumped = dict.fromkeys(
            head[:-1] + [never_tail[0]] + [head[-1]]
            + [k for k in tail if k != never_tail[0]]
        )
        real_q = entrymod.queries()
        monkeypatch.setattr(
            entrymod,
            "queries",
            lambda: {k: real_q[k] for k in jumped},
        )
        with pytest.raises(
            AssertionError,
            match="rotation violated|never-driver-verified",
        ):
            rotation_check.check()
