"""Enforce the driver-window rotation policy as code (VERDICT r9 item 6).

The driver's correctness harness hash-verifies only the FIRST
``WINDOW`` keys of ``__spark_entry__.queries()`` (dict insertion
order) each round.  With more registered keys than window slots, the
ordering policy is the only thing that guarantees every key
eventually earns a driver-checked CORRECTNESS row:

  HEAD — keys with the weakest driver evidence: never-verified keys
    first, then stalest-first (smallest "latest green round").  Keys
    whose semantics changed in the current session may be declared in
    ``__spark_entry__.CHANGED_KEYS`` and are then exempt from the
    staleness comparison (they deserve re-verification regardless of
    how fresh their old evidence is).
  TAIL — keys whose recent evidence makes them safe to skip a round.

Round 9 regressed this ordering silently (new keys jumped the queue
and pushed 51 keys past the window); this module turns the prose
policy in __spark_entry__.py into an assertion wired into pytest.

Usage:
    python tools/rotation_check.py          # report + exit code
    from tools.rotation_check import check  # pytest entry
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def latest_evidence(repo: str = REPO) -> dict[str, int]:
    """Map query key -> latest round with a green driver CORRECTNESS row.

    A row counts as green when the driver recorded no error and the
    row counts matched (hash_match implies rows_match; rows-only keys
    have hash_match null but still earn evidence).
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            # hash_match False is a content mismatch — not green
            # evidence even when the row counts matched (ADVICE r10
            # item 3: text_entropy r03/r04, x_bloom_membership r03);
            # hash_match null (rows-only keys) still counts.
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("hash_match") is not False
            ):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


def check(window: int = WINDOW) -> dict:
    """Assert the queries() head honors the rotation policy.

    Returns a report dict on success; raises AssertionError with a
    precise message on violation.
    """
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries().keys())
    assert len(keys) == len(set(keys)), "duplicate query keys registered"
    latest = latest_evidence()
    changed = set(getattr(entrymod, "CHANGED_KEYS", ()))
    unknown_changed = changed - set(keys)
    assert not unknown_changed, (
        f"CHANGED_KEYS lists unregistered keys: {sorted(unknown_changed)}"
    )

    head, tail = keys[:window], keys[window:]
    never = [k for k in keys if k not in latest]

    # 1. Every never-verified key must sit inside the head window OR
    #    form the leading prefix of the tail (the latter is what a
    #    registration freeze looks like: keys added mid-round queue at
    #    the tail front and enter the next round's head first).
    missing = [k for k in never if k not in head]
    lead = tail[: len(missing)]
    assert lead == missing, (
        f"never-driver-verified keys neither in the {window}-key head "
        f"nor leading the tail: {sorted(set(missing) - set(lead))} "
        f"(tail starts {lead})"
    )

    # 2. No tail key may have strictly staler evidence than a
    #    non-exempt verified head key (ties at the boundary are fine —
    #    they are what "≤1 leftover for next round" looks like).
    #    ONE benign state is tolerated: immediately after the driver
    #    records a round, the head it just verified is by definition
    #    the freshest evidence — recognized as EVERY verified head key
    #    sitting at the max recorded round AND no never-verified key
    #    inside the head (a queue-jumped ordering always has one, or
    #    mixes older evidence into the head, so it is still caught).
    head_verified = [k for k in head if k in latest and k not in changed]
    tail_verified = [k for k in tail if k in latest and k not in changed]
    max_round = max(latest.values(), default=0)
    just_recorded = (
        bool(head_verified)
        and all(latest[k] == max_round for k in head_verified)
        and not any(k in head for k in never)
    )
    if head_verified and tail_verified and not just_recorded:
        freshest_head = max(head_verified, key=lambda k: latest[k])
        stalest_tail = min(tail_verified, key=lambda k: latest[k])
        assert latest[freshest_head] <= latest[stalest_tail], (
            f"rotation violated: head key {freshest_head!r} has evidence "
            f"r{latest[freshest_head]:02d} but tail key {stalest_tail!r} "
            f"is staler at r{latest[stalest_tail]:02d} — stale keys must "
            f"enter the window first"
        )

    debt = len(never) + sum(
        1
        for k in keys
        if k in latest and latest[k] < max(latest.values(), default=0) - 2
    )
    return {
        "registered": len(keys),
        "window": window,
        "never_verified": len(never),
        # True in the benign post-recording state (the head the driver
        # just verified is by definition the freshest evidence); the
        # pytest wrapper must skip the raw freshness comparison when
        # set instead of re-deriving it without this tolerance.
        "just_recorded": just_recorded,
        # policy-relevant freshness only: CHANGED_KEYS are exempt from
        # the staleness ordering (they may sit in the head with fresh
        # evidence precisely because they changed), so they must not
        # appear here either — the pytest wrapper re-derives the raw
        # inequality from this field (r12: a changed r11 key in the
        # r12 head flipped the wrapper red while check() itself
        # correctly passed).
        "head_freshness": sorted(
            {latest[k] for k in head if k in latest and k not in changed}
        ),
        "tail_stalest": min(
            (latest[k] for k in tail if k in latest), default=None
        ),
        "evidence_debt_gt2_rounds": debt,
    }


if __name__ == "__main__":
    try:
        report = check()
    except AssertionError as e:
        print(f"ROTATION VIOLATION: {e}")
        sys.exit(1)
    print(json.dumps(report, indent=2))
