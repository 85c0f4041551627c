"""Property-based tests (hypothesis) for the CDC merge algebra
(operators/load.py) — the invariants that make the pipeline's
at-least-once delivery effectively-once (SURVEY.md §2.11, §7.3):

1. replay idempotence: applying the same batch twice == once
   (why failed-load replays are safe, runner.py offset-after-load);
2. chronological batch-split equivalence: applying events in one batch
   == applying them in two time-split batches (why micro-batch
   boundaries never change the final table state);
3. latest_by_key: exactly one survivor per key, and it is the max by
   (order, tiebreak).

Events are generated driver-side (small domains force key collisions
and UPDATE-then-REMOVE interleavings) and applied through the real
Spark operators; results are compared as sorted row sets.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from migrator_spark.operators.extract import M_REMOVE, M_REPLACE, METHOD_COL
from migrator_spark.operators import load as ld

KEYS = st.integers(min_value=0, max_value=7)  # small domain -> collisions
VALS = st.integers(min_value=-100, max_value=100)

# an event: (key, value, method); seq (the order col) is the list index,
# so per-key order is total and deterministic
EVENTS = st.lists(
    st.tuples(KEYS, VALS, st.sampled_from([M_REPLACE, M_REMOVE, "INSERT"])),
    min_size=0,
    max_size=24,
)
TARGETS = st.dictionaries(KEYS, VALS, max_size=8)

EVENT_SCHEMA = f"k long, v long, {METHOD_COL} string, seq long, tie string"
TARGET_SCHEMA = "k long, v long"

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _target_df(spark, target: dict[int, int]):
    return spark.createDataFrame(sorted(target.items()), TARGET_SCHEMA)


def _batch_df(spark, events, start_seq=0):
    rows = [
        (k, v, m, start_seq + i, str(start_seq + i))
        for i, (k, v, m) in enumerate(events)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _apply(spark, target_df, events, start_seq=0):
    if not events:
        return target_df
    batch = _batch_df(spark, events, start_seq)
    return ld.apply_cdc_batch(target_df, batch, ["k"], "seq", "tie")


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def _expected(target: dict[int, int], events) -> list[tuple[int, int]]:
    """Reference model: fold events in order over a dict."""
    state = dict(target)
    for k, v, m in events:
        if m == M_REMOVE:
            state.pop(k, None)
        else:
            state[k] = v
    return sorted(state.items())


@SETTINGS
@given(target=TARGETS, events=EVENTS)
def test_apply_matches_sequential_model(spark, target, events):
    """apply_cdc_batch == folding the events one-by-one over a dict."""
    out = _apply(spark, _target_df(spark, target), events)
    assert _rows(out) == _expected(target, events)


@SETTINGS
@given(target=TARGETS, events=EVENTS)
def test_replay_idempotent(spark, target, events):
    """Applying the same batch to its own output changes nothing."""
    once = _apply(spark, _target_df(spark, target), events)
    twice = _apply(spark, once, events)
    assert _rows(twice) == _rows(once)


@SETTINGS
@given(target=TARGETS, events=EVENTS, split=st.integers(min_value=0, max_value=24))
def test_chronological_split_equivalence(spark, target, events, split):
    """One batch == two chronological micro-batches at any split point."""
    split = min(split, len(events))
    one = _apply(spark, _target_df(spark, target), events)
    first = _apply(spark, _target_df(spark, target), events[:split])
    both = _apply(spark, first, events[split:], start_seq=split)
    assert _rows(both) == _rows(one)


@SETTINGS
@given(events=EVENTS)
def test_latest_by_key_is_max(spark, events):
    """One survivor per key; it carries the key's max seq."""
    if not events:
        return
    batch = _batch_df(spark, events)
    out = ld.latest_by_key(batch, ["k"], "seq", "tie").collect()
    per_key_max = {}
    for i, (k, _, _) in enumerate(events):
        per_key_max[k] = i
    assert len(out) == len(per_key_max)
    for r in out:
        assert r["seq"] == per_key_max[r["k"]]
