"""Property tests: window_funnel against a brute-force greedy reference,
chunk_dedup's global exactly-once invariant.

Hypothesis drives small random event streams / corpora through the
distributed operators and checks them against straight-line Python
implementations of the same contracts.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphouse_spark.functions.behavior import window_funnel
from graphouse_spark.functions.text import chunk_dedup

STEPS = ["view", "click", "purchase"]
EVENT_TYPES = STEPS + ["error"]


def funnel_reference(rows, window):
    """Greedy first-match funnel, straight-line per user."""
    out = {}
    by_user = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    for u, evs in by_user.items():
        t1 = min((ts for t, ts in evs if t == STEPS[0]), default=None)
        if t1 is None:
            continue
        level, prev = 1, t1
        for step in STEPS[1:]:
            nxt = min(
                (ts for t, ts in evs if t == step and prev < ts <= t1 + window),
                default=None,
            )
            if nxt is None:
                break
            level, prev = level + 1, nxt
        out[u] = level
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # user
        st.sampled_from(EVENT_TYPES),                 # type
        st.integers(min_value=0, max_value=500),      # ts
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=events_strategy, window=st.sampled_from([50, 200]))
def test_window_funnel_matches_reference(spark, rows, window):
    df = spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts_sec long",
    )
    got = {r["user_id"]: r["level"]
           for r in window_funnel(df, STEPS, window).collect()}
    assert got == funnel_reference(rows, window)


texts_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=9)
    .map(" ".join),
    min_size=1,
    max_size=6,
)


def chunk_dedup_reference(texts, n=2):
    """Straight-line chunk dedup: iterate docs in id order, chunks in
    order — the first visit IS the global min (doc_id, chunk_idx)."""
    def chunks_of(t):
        toks = [w for w in t.split() if w]
        return [" ".join(toks[i:i + n]) for i in range(0, len(toks), n)]

    seen = set()
    expected = {}
    for doc_id, t in enumerate(texts):
        own = chunks_of(t)
        kept = []
        for c in own:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expected[doc_id] = (" ".join(kept), len(own), len(kept))
    return expected


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=texts_strategy)
def test_chunk_dedup_matches_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: (r["kept_text"], r["n_chunks"], r["n_kept"])
           for r in chunk_dedup(df, chunk_tokens=2).collect()}
    assert got == chunk_dedup_reference(texts, n=2)


# --- duplicated_spans vs straight-line reference ---

def spans_reference(docs, n, min_docs):
    """Brute-force: window -> docs map, flag, merge consecutive flags."""
    toks = {d: t.lower().split() for d, t in docs}
    wins = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            wins.setdefault(tuple(ts[i:i + n]), set()).add(d)
    hot = {w for w, ds in wins.items() if len(ds) >= min_docs}
    out = set()
    for d, ts in toks.items():
        flagged = [i for i in range(len(ts) - n + 1) if tuple(ts[i:i + n]) in hot]
        if not flagged:
            continue
        start = prev = flagged[0]
        cnt = 1
        for p in flagged[1:]:
            if p == prev + 1:
                prev = p
                cnt += 1
            else:
                out.add((d, start, prev + n - 1, cnt))
                start = prev = p
                cnt = 1
        out.add((d, start, prev + n - 1, cnt))
    return out


words_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=18)
    .map(lambda ws: " ".join(ws)),
    min_size=2, max_size=5,
)


@pytest.mark.slow
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=words_strategy, n=st.sampled_from([2, 3]))
def test_duplicated_spans_matches_reference(spark, texts, n):
    from graphouse_spark.functions.text import duplicated_spans

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
           for r in duplicated_spans(df, n=n, min_docs=2).collect()}
    assert got == spans_reference(docs, n, 2)
