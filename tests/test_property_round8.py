"""Property tests for the round-8 operator invariants: batch
gap-sessionization against a pure-Python reference (arrival-order
independence included), and the weighted lottery's determinism +
append-stability."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

T0 = 1_700_000_000_000_000
MIN_US = 60_000_000


def _reference_sessions(events, gap_us):
    """Pure-Python gaps-and-islands: per user, sorted event times
    split wherever the gap exceeds gap_us."""
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap_us:
                out.add((u, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        out.add((u, start, prev, n))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),     # user
            st.integers(min_value=0, max_value=600),   # minutes offset
        ),
        min_size=1,
        max_size=60,
    ),
    gap_minutes=st.sampled_from([1, 10, 45]),
    order_seed=st.integers(min_value=0, max_value=3),
)
def test_sessionize_batch_matches_reference(
    spark, events, gap_minutes, order_seed
):
    """sessionize_batch == the pure-Python gap grouping, regardless
    of row arrival order (the property the STREAMING twin cannot
    have — its watermark depends on order; the batch op must not)."""
    from sslr_spark.streaming.pipeline import sessionize_batch

    rows = [(u, T0 + m * MIN_US) for u, m in events]
    # permute arrival order deterministically from the seed
    rows = sorted(
        rows, key=lambda r: hash((order_seed, r[0], r[1])) % 997
    )
    df = spark.createDataFrame(rows, "user_id long, ts_us long").select(
        "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in sessionize_batch(df, gap_minutes=gap_minutes).collect()
    }
    assert got == _reference_sessions(rows, gap_minutes * MIN_US)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=5, max_value=40),
    extra=st.integers(min_value=1, max_value=10),
    k=st.sampled_from([1, 3, 7]),
)
def test_weighted_sample_append_stability(spark, n, extra, k):
    """Appending NEW keys never changes an existing key's ticket
    (ticket = f(seed, key, i) only), so winners change ONLY by fair
    displacement: the new winner set is exactly the bottom-k of the
    union's tickets — old winners are displaced by strictly better
    tickets, never reshuffled."""
    from sslr_spark.functions.sampling import weighted_sample

    def mk(rows):
        return spark.createDataFrame(rows, "id long, w long")

    base = [(i, i % 4 + 1) for i in range(n)]
    appended = base + [(1000 + j, j % 4 + 1) for j in range(extra)]
    before = {
        r.id: r.best_ticket
        for r in weighted_sample(mk(base), "id", "w", k=k).collect()
    }
    after = {
        r.id: r.best_ticket
        for r in weighted_sample(mk(appended), "id", "w", k=k).collect()
    }
    # tickets of surviving winners are unchanged by the append
    for vid in set(before) & set(after):
        assert before[vid] == after[vid]
    # displacement is fair: every new winner not in the old set must
    # hold a ticket at or below the worst old winner's ticket
    if before and after:
        worst_old = max(before.values())
        for vid, t in after.items():
            if vid not in before:
                assert t <= worst_old
