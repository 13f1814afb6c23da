"""Model-based randomized tests for the round-5 sequence/similarity
operators whose logic is subtle enough to deserve an independent
pure-python oracle beyond the DuckDB parity pair:

- the sequence-funnel state-machine fold (pre-update state reads,
  strict progression, tie order)
- the PPJoin prefix filter (losslessness under adversarial frequency
  distributions, not just the sf0.01 corpus)
"""

from __future__ import annotations

import itertools
import random
from datetime import datetime, timedelta

import pyspark.sql.functions as F


def _py_funnel(events, pattern=("signup", "click", "purchase")):
    """Reference state machine over (ts, event_id, event_type) sorted
    ascending: stage k advances on the first matching event strictly
    after the event that advanced stage k-1."""
    ts = [None] * len(pattern)
    stage = 0
    for t, _eid, et in sorted(events):
        if stage < len(pattern) and et == pattern[stage]:
            ts[stage] = t
            stage += 1
    return stage, ts


def test_funnel_fold_matches_python_model(spark):
    rng = random.Random(7)
    types = ["signup", "click", "purchase", "view", "error"]
    base = datetime(2025, 1, 1)
    rows = []
    per_user = {}
    for uid in range(40):
        n = rng.randint(0, 12)
        evs = []
        for i in range(n):
            # deliberately generate ts ties (same second) to exercise
            # the (ts, event_id) tie order
            t = base + timedelta(seconds=rng.randint(0, 5))
            eid = uid * 100 + i
            et = rng.choice(types)
            evs.append((t, eid, et))
            rows.append((eid, t, uid, et, 1.0, "{}"))
        per_user[uid] = evs
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import cascading_hbase_spark.queries.events as EV

    orig = EV.load_table
    try:
        EV.load_table = lambda s, d, n: df
        out = {
            r.user_id: (r.stage, r.signup_ts, r.click_ts, r.purchase_ts)
            for r in EV.sequence_funnel_3step(spark, "ignored").collect()
        }
    finally:
        EV.load_table = orig
    for uid, evs in per_user.items():
        if not evs:
            continue
        stage, ts = _py_funnel(evs)
        got = out[uid]
        assert got[0] == stage, (uid, evs, got)
        assert (got[1], got[2], got[3]) == tuple(ts), (uid, evs, got)


def _py_jaccard_pairs(docs, t_num=1, t_den=2):
    sets = {i: set(s) for i, s in docs.items() if s}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and i * t_den >= t_num * u:
            out[(a, b)] = i / u
    return out


def test_prefix_join_lossless_on_adversarial_freqs(spark):
    """Hot-token-heavy corpus: most docs share the same frequent
    shingles (the case prefix filtering exists for) plus rare tails.
    The filter must still find every qualifying pair."""
    from cascading_hbase_spark.functions.dedup import setsim_prefix_join

    rng = random.Random(11)
    vocab_hot = [f"hot{i}" for i in range(4)]
    vocab_rare = [f"rare{i}" for i in range(60)]
    docs = {}
    for d in range(30):
        toks = rng.sample(vocab_hot, rng.randint(2, 4)) + rng.sample(
            vocab_rare, rng.randint(0, 5)
        )
        rng.shuffle(toks)
        docs[d] = toks
    rows = [(d, " ".join(toks)) for d, toks in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # shingle_n=1 => token sets, so the python model is exact
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in setsim_prefix_join(df, "doc_id", "text", 1, 2, shingle_n=1).collect()
    }
    want = _py_jaccard_pairs({d: set(t) for d, t in docs.items()})
    assert set(got) == set(want), (
        set(want) - set(got), set(got) - set(want))
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)


def test_twap_excludes_zero_span_users(spark):
    """A user whose every event shares one timestamp has zero total
    holding time; under ANSI mode the unguarded division would throw
    DIVIDE_BY_ZERO — the query must exclude the group instead (review
    finding, round 5)."""
    import cascading_hbase_spark.queries.events as EV

    t = datetime(2025, 3, 1, 12, 0, 0)
    rows = [
        (1, t, 7, "view", 10.0, "{}"),
        (2, t, 7, "click", 20.0, "{}"),   # same ts -> zero span
        (3, t, 8, "view", 5.0, "{}"),
        (4, t + timedelta(seconds=10), 8, "view", 15.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = EV.load_table
    try:
        EV.load_table = lambda s, d, n: df
        out = {r.user_id: r.twap for r in EV.twap_per_user(spark, "x").collect()}
    finally:
        EV.load_table = orig
    assert 7 not in out          # zero-span user excluded, no throw
    assert out[8] == 5.0         # value 5 held for the whole span
