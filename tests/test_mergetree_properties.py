"""MergeTree-semantics family invariants against brute-force Python replays
on small randomized event tables — independent of the DuckDB oracle (which
shares SQL semantics and could share a misconception).

The windowFunnel check matters most: the declared query runs a linear fold
(latest-chain-start DP), the oracle runs EXISTS-chain joins, and this test
runs a third, exhaustive O(n³) enumeration — three independent formulations
of the same contract.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
    x_session_paths,
    x_window_funnel,
)

from .test_behavior_property import SCHEMA, TYPES, _write_and_point

WINDOW = dt.timedelta(hours=1)
GAP = dt.timedelta(minutes=30)


def _random_events(seed: int, n_users: int = 10, n_events: int = 200, spread_min: int = 60 * 24):
    """Denser-than-behavior-tests timestamps so 1-hour windows actually bind
    (and sometimes don't — both branches of the window check get exercised)."""
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    return [
        (
            i,
            base + dt.timedelta(minutes=rng.randrange(0, spread_min)),
            rng.randrange(1, n_users + 1),
            rng.choice(TYPES),
            round(rng.uniform(0, 100), 2),
            "{}",
        )
        for i in range(n_events)
    ]


def _brute_window_funnel(rows):
    """Exhaustive chain enumeration: depth 3 iff ∃ signup s, view v, purchase
    p with (s)<(v)<(p) in (ts, event_id) order and v.ts, p.ts ≤ s.ts + 1h."""
    by_user: dict = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    hist: dict[int, int] = {}
    for evs in by_user.values():
        evs.sort()
        signups = [(ts, eid) for ts, eid, e in evs if e == "signup"]
        views = [(ts, eid) for ts, eid, e in evs if e == "view"]
        purchases = [(ts, eid) for ts, eid, e in evs if e == "purchase"]
        if not signups:
            continue
        depth = 1
        for s in signups:
            for v in views:
                if v > s and v[0] <= s[0] + WINDOW:
                    depth = max(depth, 2)
                    for p in purchases:
                        if p > v and p[0] <= s[0] + WINDOW:
                            depth = 3
        hist[depth] = hist.get(depth, 0) + 1
    return hist


def test_window_funnel_matches_brute_force(spark, tmp_path):
    # Wide spread (windows rarely bind), tight spread (chains everywhere),
    # and a mid case.
    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"wf{seed}")
        got = {r["depth"]: r["n_users"] for r in x_window_funnel(spark, sf).collect()}
        assert got == _brute_window_funnel(rows), (seed, spread)


def test_window_funnel_anchors_window_at_first_step(spark, tmp_path):
    """Hand-built chain: view at +50 min, purchase at +70 min. Each adjacent
    gap < 1h but the purchase is outside the window anchored at the signup →
    depth must stop at 2 (the unbounded funnel would say 3)."""
    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base, 1, "signup", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=50), 1, "view", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=70), 1, "purchase", 1.0, "{}"),
        # User 2: the same chain fully inside the hour → depth 3.
        (4, base, 2, "signup", 1.0, "{}"),
        (5, base + dt.timedelta(minutes=20), 2, "view", 1.0, "{}"),
        (6, base + dt.timedelta(minutes=59), 2, "purchase", 1.0, "{}"),
        # User 3: a LATER signup re-anchors the window and rescues the chain.
        (7, base, 3, "signup", 1.0, "{}"),
        (8, base + dt.timedelta(minutes=55), 3, "signup", 1.0, "{}"),
        (9, base + dt.timedelta(minutes=80), 3, "view", 1.0, "{}"),
        (10, base + dt.timedelta(minutes=110), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "wf_anchor")
    got = {r["depth"]: r["n_users"] for r in x_window_funnel(spark, sf).collect()}
    assert got == {2: 1, 3: 2}


def _brute_session_paths(rows):
    by_user: dict = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    counts: dict = {}
    for evs in by_user.values():
        evs.sort()
        for (ts_a, _ea, a), (ts_b, _eb, b) in zip(evs, evs[1:]):
            if ts_b - ts_a <= GAP:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(src, dst, n) for (src, dst), n in ranked[:20]]


def test_session_paths_matches_brute_force(spark, tmp_path):
    for seed in (11, 42):
        rows = _random_events(seed, spread_min=60 * 24 * 3)
        sf = _write_and_point(spark, tmp_path, rows, f"sp{seed}")
        got = [
            (r["src"], r["dst"], r["n_transitions"])
            for r in x_session_paths(spark, sf).collect()
        ]
        assert got == _brute_session_paths(rows), seed


def test_sequence_count_matches_greedy_simulation(spark):
    """The closed form (#B - max prefix excess) must equal a literal greedy
    matcher run over each user's ordered signup/purchase timeline."""
    from .conftest import SF_ORACLE
    from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    ev = load_tables(spark, SF_ORACLE)["events"]
    rows = (
        ev.filter(ev.event_type.isin("signup", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    timelines: dict[int, list] = {}
    for r in rows:
        timelines.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    expected = {}
    for user, tl in timelines.items():
        avail = matched = 0
        for _, _, et in sorted(tl):
            if et == "signup":
                avail += 1
            elif avail > 0:
                matched += 1
                avail -= 1
        if matched > 0:
            expected[user] = matched
    got = {
        r["user_id"]: r["n_matched"]
        for r in all_queries()["x_sequence_count"].fn(spark, SF_ORACLE).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# strict_order windowFunnel (round 7)
# ---------------------------------------------------------------------------

def _brute_strict_order_funnel(rows):
    """Max depth over ADJACENT runs in the user's full (ts, eid) timeline,
    window anchored at each run's signup."""
    by_user: dict = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    hist: dict = {}
    for _uid, evs in by_user.items():
        evs.sort()
        if not any(e[2] == "signup" for e in evs):
            continue
        best, c, s = 0, 0, None
        for ts, _eid, etype in evs:
            if c == 1 and etype == "view" and ts <= s + WINDOW:
                c = 2
            elif c == 2 and etype == "purchase" and ts <= s + WINDOW:
                c = 3
            elif etype == "signup":
                c, s = 1, ts
            else:
                c, s = 0, None
            best = max(best, c)
        if best:
            hist[best] = hist.get(best, 0) + 1
    return hist


def test_strict_order_funnel_matches_brute_force(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_strict,
    )

    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"wfs{seed}")
        got = {
            r["depth"]: r["n_users"]
            for r in x_window_funnel_strict(spark, sf).collect()
        }
        assert got == _brute_strict_order_funnel(rows), (seed, spread)


def test_strict_order_funnel_interleaving_kills_chain(spark, tmp_path):
    """CH's own strict_order example: in signup→view→OTHER→purchase the
    OTHER event interrupts at depth 2; the default funnel would reach 3.
    A later clean run still counts (documented divergence from CH's
    freeze-at-first-interruption scan)."""
    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    rows = [
        # user 1: A B D C -> strict depth 2
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(5), 1, "view", 1.0, "{}"),
        (3, mins(10), 1, "click", 1.0, "{}"),
        (4, mins(15), 1, "purchase", 1.0, "{}"),
        # user 2: A B C adjacent -> strict depth 3
        (5, mins(0), 2, "signup", 1.0, "{}"),
        (6, mins(5), 2, "view", 1.0, "{}"),
        (7, mins(10), 2, "purchase", 1.0, "{}"),
        # user 3: dirty first run, clean later run -> still depth 3
        (8, mins(0), 3, "signup", 1.0, "{}"),
        (9, mins(2), 3, "click", 1.0, "{}"),
        (10, mins(20), 3, "signup", 1.0, "{}"),
        (11, mins(25), 3, "view", 1.0, "{}"),
        (12, mins(30), 3, "purchase", 1.0, "{}"),
    ]
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_strict,
        x_window_funnel,
    )

    sf = _write_and_point(spark, tmp_path, rows, "wfs_doc")
    strict = {
        r["depth"]: r["n_users"]
        for r in x_window_funnel_strict(spark, sf).collect()
    }
    assert strict == {2: 1, 3: 2}
    dflt = {r["depth"]: r["n_users"] for r in x_window_funnel(spark, sf).collect()}
    assert dflt == {3: 3}  # the default mode tolerates the interleavings


# ---------------------------------------------------------------------------
# timed sequenceMatch (round 7)
# ---------------------------------------------------------------------------

SEQ_GAP = dt.timedelta(hours=4)


def _brute_timed_seq_match(rows):
    by_user: dict = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    n2 = n3 = 0
    for _uid, evs in by_user.items():
        evs.sort()
        m2 = any(
            a[2] == "signup" and b[2] == "purchase" and b[:2] > a[:2]
            and b[0] <= a[0] + SEQ_GAP
            for a in evs for b in evs
        )
        m3 = any(
            a[2] == "signup" and b[2] == "click" and c[2] == "purchase"
            and b[:2] > a[:2] and b[0] <= a[0] + SEQ_GAP
            and c[:2] > b[:2] and c[0] <= b[0] + SEQ_GAP
            for a in evs for b in evs for c in evs
        )
        n2 += m2
        n3 += m3
    return {"signup(?t<=14400)purchase": n2,
            "signup(?t<=14400)click(?t<=14400)purchase": n3}


def test_timed_sequence_match_matches_brute_force(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_sequence_match_timed,
    )

    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"sqt{seed}")
        got = {
            r["pattern"]: r["n_matched"]
            for r in x_sequence_match_timed(spark, sf).collect()
        }
        assert got == _brute_timed_seq_match(rows), (seed, spread)


def test_timed_sequence_match_needs_latest_anchor_not_greedy(spark, tmp_path):
    """Greedy earliest-first matching is wrong under gap bounds: the first
    signup times out before the purchase, but a LATER signup completes the
    pattern. The fold must keep the latest anchor per level."""
    base = dt.datetime(2024, 3, 1)
    h = lambda x: base + dt.timedelta(hours=x)
    rows = [
        (1, h(0), 1, "signup", 1.0, "{}"),     # early anchor: times out
        (2, h(5), 1, "signup", 1.0, "{}"),     # late anchor: in range
        (3, h(7), 1, "purchase", 1.0, "{}"),   # 2h after the late signup
        # user 2: only the early signup -> no match
        (4, h(0), 2, "signup", 1.0, "{}"),
        (5, h(7), 2, "purchase", 1.0, "{}"),
    ]
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_sequence_match_timed,
    )

    sf = _write_and_point(spark, tmp_path, rows, "sqt_anchor")
    got = {
        r["pattern"]: r["n_matched"]
        for r in x_sequence_match_timed(spark, sf).collect()
    }
    assert got["signup(?t<=14400)purchase"] == 1


# ---------------------------------------------------------------------------
# strict_deduplication windowFunnel (round 7)
# ---------------------------------------------------------------------------

def _brute_strict_dedup_funnel(rows):
    by_user: dict = {}
    for eid, ts, uid, etype, _v, _p in rows:
        if etype in ("signup", "view", "purchase"):
            by_user.setdefault(uid, []).append((ts, eid, etype))
    hist: dict = {}
    for _uid, evs in by_user.items():
        evs.sort()
        if not any(e[2] == "signup" for e in evs):
            continue
        best, c, s = 0, 0, None
        for ts, _eid, etype in evs:
            gained = 0
            if c == 1 and etype == "view" and s is not None and ts <= s + WINDOW:
                c, gained = 2, 2
            elif c == 2 and etype == "purchase" and ts <= s + WINDOW:
                c, s, gained = 0, None, 3
            elif etype == "signup":
                c, s, gained = 1, ts, 1
            elif etype == "view" and c >= 2:
                c, s = 0, None
            best = max(best, gained)
        if best:
            hist[best] = hist.get(best, 0) + 1
    return hist


def test_strict_dedup_funnel_matches_brute_force(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_dedup,
    )

    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"wfd{seed}")
        got = {
            r["depth"]: r["n_users"]
            for r in x_window_funnel_dedup(spark, sf).collect()
        }
        assert got == _brute_strict_dedup_funnel(rows), (seed, spread)


def test_dedup_mode_sits_between_default_and_strict_order(spark, tmp_path):
    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    rows = [
        # user 1: signup view CLICK purchase — the click passes in dedup
        # mode (depth 3) but kills strict_order (depth 2)
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(5), 1, "view", 1.0, "{}"),
        (3, mins(10), 1, "click", 1.0, "{}"),
        (4, mins(15), 1, "purchase", 1.0, "{}"),
        # user 2: signup view VIEW purchase — the duplicate view kills
        # dedup mode (depth 2) but passes the default funnel (depth 3)
        (5, mins(0), 2, "signup", 1.0, "{}"),
        (6, mins(5), 2, "view", 1.0, "{}"),
        (7, mins(10), 2, "view", 1.0, "{}"),
        (8, mins(15), 2, "purchase", 1.0, "{}"),
    ]
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel,
        x_window_funnel_dedup,
        x_window_funnel_strict,
    )

    sf = _write_and_point(spark, tmp_path, rows, "wfd_doc")
    as_map = lambda df: {r["depth"]: r["n_users"] for r in df.collect()}
    assert as_map(x_window_funnel(spark, sf)) == {3: 2}
    assert as_map(x_window_funnel_dedup(spark, sf)) == {2: 1, 3: 1}
    assert as_map(x_window_funnel_strict(spark, sf)) == {2: 2}


# ---------------------------------------------------------------------------
# freeze-parity strict_order funnel (round 8)
# ---------------------------------------------------------------------------

def _brute_freeze_funnel(rows):
    """CH strict_order, transcribed from AggregateFunctionWindowFunnel.h's
    else-if chain: only a NO-condition event breaks the scan (and only
    after the first step-1 event); a step-1 event always re-anchors;
    non-advancing/out-of-window step events pass through; recorded levels
    survive the break."""
    by_user = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    hist = {}
    for evs in by_user.values():
        evs.sort()
        s1 = s2 = None  # level anchors: latest signup / level-2 chain start
        best, first_event = 0, False
        for ts, _eid, etype in evs:
            if etype == "signup":
                s1, first_event = ts, True
                best = max(best, 1)
            elif etype == "view":
                if s1 is not None and ts <= s1 + WINDOW:
                    s2 = s1
                    best = max(best, 2)
            elif etype == "purchase":
                if s2 is not None and ts <= s2 + WINDOW:
                    best = 3
                    break  # full depth: CH early-returns events_size
            elif first_event:
                break
        if best:
            hist[best] = hist.get(best, 0) + 1
    return hist


def test_freeze_funnel_matches_brute_force(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_freeze,
    )

    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"wff{seed}")
        got = {
            r["depth"]: r["n_users"]
            for r in x_window_funnel_freeze(spark, sf).collect()
        }
        assert got == _brute_freeze_funnel(rows), (seed, spread)


def test_freeze_vs_strict_divergence_frames(spark, tmp_path):
    """The exact frames the two strict_order readings disagree on. CH's
    scan (x_window_funnel_freeze) breaks only on NO-condition events: a
    dirty first chain followed by a clean run stays depth 1, but repeated
    signups re-anchor and repeated views pass through (both depth 3 —
    the round-9 corrected reading). The adjacency/max-over-runs reading
    (x_window_funnel_strict) counts the later clean run but kills chains
    on ANY non-expected event, including repeated steps."""
    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    rows = [
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(2), 1, "click", 1.0, "{}"),     # no-cond: breaks CH scan
        (3, mins(20), 1, "signup", 1.0, "{}"),   # clean run: frozen scan
        (4, mins(25), 1, "view", 1.0, "{}"),     #  never sees these
        (5, mins(30), 1, "purchase", 1.0, "{}"),
        # user 2: events BEFORE the first signup never interrupt
        (6, mins(0), 2, "click", 1.0, "{}"),
        (7, mins(5), 2, "signup", 1.0, "{}"),
        (8, mins(10), 2, "view", 1.0, "{}"),
        (9, mins(15), 2, "purchase", 1.0, "{}"),
        # user 3: a repeated signup RE-ANCHORS in CH (depth 3 both ways —
        # strict restarts its run at the second signup and completes too)
        (10, mins(0), 3, "signup", 1.0, "{}"),
        (11, mins(5), 3, "signup", 1.0, "{}"),
        (12, mins(10), 3, "view", 1.0, "{}"),
        (13, mins(15), 3, "purchase", 1.0, "{}"),
        # user 4: a repeated view PASSES THROUGH in CH (depth 3) but is a
        # non-adjacent interleaving to strict (depth 2)
        (14, mins(0), 4, "signup", 1.0, "{}"),
        (15, mins(5), 4, "view", 1.0, "{}"),
        (16, mins(10), 4, "view", 1.0, "{}"),
        (17, mins(15), 4, "purchase", 1.0, "{}"),
    ]
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_freeze,
        x_window_funnel_strict,
    )

    sf = _write_and_point(spark, tmp_path, rows, "wff_doc")
    as_map = lambda df: {r["depth"]: r["n_users"] for r in df.collect()}
    assert as_map(x_window_funnel_freeze(spark, sf)) == {1: 1, 3: 3}
    assert as_map(x_window_funnel_strict(spark, sf)) == {2: 1, 3: 3}


def test_dialect_window_funnel_equals_dataframe_fold_on_random_frames(
    spark, tmp_path
):
    """The round-8 dialect-generated windowFunnel fold and the DataFrame
    fold are the same algorithm — random frames must agree exactly."""
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel,
    )
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    sql = translate(
        "SELECT depth, count() AS n_users FROM (SELECT user_id, "
        "windowFunnel(3600)(ts, event_type = 'signup', "
        "event_type = 'view', event_type = 'purchase') AS depth "
        "FROM events GROUP BY user_id) WHERE depth >= 1 GROUP BY depth"
    )
    for seed, spread in ((5, 60 * 24), (31, 60 * 6), (77, 60 * 72)):
        # de-tie the whole-minute timestamps (unique µs per event id): the
        # dialect fold ties by CH's (ts, event number) pair sort, the
        # DataFrame fold by (ts, event_id) — equal only when ts is unique
        rows = [
            (eid, ts + dt.timedelta(microseconds=eid), uid, et, v, p)
            for eid, ts, uid, et, v, p in _random_events(
                seed, spread_min=spread
            )
        ]
        sf = _write_and_point(spark, tmp_path, rows, f"dwf{seed}")
        load_tables(spark, sf)
        got = {r["depth"]: r["n_users"] for r in spark.sql(sql).collect()}
        want = {r["depth"]: r["n_users"]
                for r in x_window_funnel(spark, sf).collect()}
        assert got == want, (seed, spread)


# ---------------------------------------------------------------------------
# strict_deduplication via the dialect (round 9): CH's exact scan
# ---------------------------------------------------------------------------

def _brute_ch_strict_dedup(rows):
    """CH strict_deduplication, transcribed from
    AggregateFunctionWindowFunnel.h's else-if chain: step-1 events
    re-anchor (their branch precedes the dedup check); an event matching
    an already-RECORDED step k >= 2 ends the scan with result k (even
    below the recorded max); completing the last step early-returns N;
    no-condition events pass through. Ties order by (ts, event number) —
    the fold's CH pair sort."""
    order = {"signup": 1, "view": 2, "purchase": 3}
    by_user = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, order.get(etype, 0), etype))
    hist = {}
    for evs in by_user.values():
        evs.sort()
        anchors = {}
        d = 0
        res = None
        for ts, _num, etype in evs:
            k = order.get(etype)
            if k is None:
                continue
            if k == 1:
                anchors[1] = ts
                d = max(d, 1)
            elif d >= k:
                res = k
                break
            elif anchors.get(k - 1) is not None \
                    and ts <= anchors[k - 1] + WINDOW:
                anchors[k] = anchors[k - 1]
                d = max(d, k)
                if k == 3:
                    res = 3
                    break
        final = res if res is not None else d
        if final:
            hist[final] = hist.get(final, 0) + 1
    return hist


def test_dialect_strict_dedup_matches_ch_transcription(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    sql = translate(
        "SELECT depth, count() AS n_users FROM (SELECT user_id, "
        "windowFunnel(3600, 'strict_deduplication')(ts, "
        "event_type = 'signup', event_type = 'view', "
        "event_type = 'purchase') AS depth "
        "FROM events GROUP BY user_id) WHERE depth >= 1 GROUP BY depth"
    )
    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"dsd{seed}")
        load_tables(spark, sf)
        got = {r["depth"]: r["n_users"] for r in spark.sql(sql).collect()}
        assert got == _brute_ch_strict_dedup(rows), (seed, spread)


def test_dialect_strict_dedup_vs_dataframe_dedup_divergence(spark, tmp_path):
    """The frame the two strict_deduplication readings disagree on: after
    signup,view a SECOND signup re-anchors in CH (step-1 events are exempt
    from the dedup check) and the repeated view then ends the scan with
    RESULT 2 — the later purchase is never seen. x_window_funnel_dedup's
    declarative reading restarts the chain at the newer anchor and counts
    the completed signup@10 -> view@15 -> purchase@20 run: depth 3."""
    import datetime as dt

    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.queries.mergetree import (
        x_window_funnel_dedup,
    )
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    rows = [
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(5), 1, "view", 1.0, "{}"),
        (3, mins(10), 1, "signup", 1.0, "{}"),
        (4, mins(15), 1, "view", 1.0, "{}"),     # dup of recorded step 2
        (5, mins(20), 1, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "dsd_doc")
    load_tables(spark, sf)
    got = spark.sql(translate(
        "SELECT user_id, windowFunnel(3600, 'strict_deduplication')(ts, "
        "event_type = 'signup', event_type = 'view', "
        "event_type = 'purchase') AS depth FROM events GROUP BY user_id"
    )).collect()
    assert {r["user_id"]: r["depth"] for r in got} == {1: 2}
    df = {r["depth"]: r["n_users"]
          for r in x_window_funnel_dedup(spark, sf).collect()}
    assert df == {3: 1}


# ---------------------------------------------------------------------------
# strict_increase via the dialect (round 9)
# ---------------------------------------------------------------------------

def _brute_ch_strict_increase(rows):
    """CH strict_increase: the default scan plus 'each advance must carry a
    strictly LATER timestamp than the event that set the previous level'
    (events_timestamp[k-1]->second < ts). Tie order inside one timestamp
    is (ts, event number) — the fold's CH pair sort."""
    order = {"signup": 1, "view": 2, "purchase": 3}
    by_user = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, order.get(etype, 0), etype))
    hist = {}
    for evs in by_user.values():
        seq = sorted(evs)
        anchors, last, d = {}, {}, 0
        for ts, _num, et in seq:
            if et == "signup":
                anchors[1] = ts
                last[1] = ts
                d = max(d, 1)
            elif (
                et == "view" and 1 in anchors
                and ts <= anchors[1] + WINDOW and last[1] < ts
            ):
                anchors[2] = anchors[1]
                last[2] = ts
                d = max(d, 2)
            elif (
                et == "purchase" and 2 in anchors
                and ts <= anchors[2] + WINDOW and last[2] < ts
            ):
                d = 3
        if d:
            hist[d] = hist.get(d, 0) + 1
    return hist


def test_dialect_strict_increase_matches_ch_transcription(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    sql = translate(
        "SELECT depth, count() AS n_users FROM (SELECT user_id, "
        "windowFunnel(3600, 'strict_increase')(ts, "
        "event_type = 'signup', event_type = 'view', "
        "event_type = 'purchase') AS depth "
        "FROM events GROUP BY user_id) WHERE depth >= 1 GROUP BY depth"
    )
    # whole-minute random timestamps collide often — the strict check and
    # the tie order both get exercised
    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"dsi{seed}")
        load_tables(spark, sf)
        got = {r["depth"]: r["n_users"] for r in spark.sql(sql).collect()}
        assert got == _brute_ch_strict_increase(rows), (seed, spread)


def test_strict_increase_blocks_equal_timestamp_advance(spark, tmp_path):
    """Hand-built ties (the ONLY frames where strict_increase differs from
    the default scan): with CH's (ts, event number) tie order the signup
    processes before its same-timestamp view, so the default mode chains
    through the tie while strict_increase blocks it."""
    import datetime as dt

    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)
    rows = [
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(0), 1, "view", 1.0, "{}"),      # tie: blocked
        (3, mins(10), 1, "purchase", 1.0, "{}"),
        (4, mins(0), 2, "signup", 1.0, "{}"),
        (5, mins(1), 2, "view", 1.0, "{}"),
        (6, mins(1), 2, "purchase", 1.0, "{}"),  # tie with the view: blocked
        (7, mins(0), 3, "signup", 1.0, "{}"),
        (8, mins(1), 3, "view", 1.0, "{}"),
        (9, mins(2), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "dsi_doc")
    load_tables(spark, sf)

    def run(mode):
        arg = f", '{mode}'" if mode else ""
        return {r["user_id"]: r["depth"] for r in spark.sql(translate(
            f"SELECT user_id, windowFunnel(3600{arg})(ts, "
            "event_type = 'signup', event_type = 'view', "
            "event_type = 'purchase') AS depth FROM events GROUP BY user_id"
        )).collect()}

    assert run(None) == {1: 3, 2: 3, 3: 3}
    assert run("strict_increase") == {1: 1, 2: 2, 3: 3}


# ---------------------------------------------------------------------------
# Combined windowFunnel modes via the dialect (round 12): composed scan
# ---------------------------------------------------------------------------

def _brute_combined_funnel(rows, modes):
    """Composed transcription of the repo's per-mode scans (each pinned
    individually above): step-1 re-anchors first; the dedup
    already-recorded check precedes the advance and ends the scan
    returning the duplicate step; the advance adds strict_increase's
    prev-last < ts conjunct; strict_order's dead bit trips on
    no-condition events after the first step-1 match. Ties order by
    (ts, lowest matched condition number; 0 for unmatched)."""
    so = "strict_order" in modes
    sd = "strict_deduplication" in modes
    si = "strict_increase" in modes
    order = {"signup": 1, "view": 2, "purchase": 3}
    n = 3
    by_user = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, order.get(etype, 0), etype))
    hist = {}
    for evs in by_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        anchors, last = {}, {}
        d, r, f = 0, None, False
        for ts, _num, et in evs:
            k = order.get(et)
            if k is None:
                if so and f:
                    break
                continue
            if k == 1:
                anchors[1] = ts
                last[1] = ts
                d = max(d, 1)
                f = True
                continue
            if sd and d >= k:
                r = k
                break
            if (
                (k - 1) in anchors
                and ts <= anchors[k - 1] + WINDOW
                and (not si or last[k - 1] < ts)
            ):
                anchors[k] = anchors[k - 1]
                last[k] = ts
                d = max(d, k)
                if sd and k == n:
                    r = n
                    break
        final = r if r is not None else d
        if final:
            hist[final] = hist.get(final, 0) + 1
    return hist


def test_dialect_combined_funnel_modes_match_composed_transcription(
    spark, tmp_path
):
    """Round-12 (r11 verdict item 5): every combined mode string must
    equal the composed scan transcription on random frames, for all four
    combinations, under both the separate-parameter and comma-joined
    spellings."""
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    combos = [
        ("strict_order", "strict_deduplication"),
        ("strict_order", "strict_increase"),
        ("strict_deduplication", "strict_increase"),
        ("strict_order", "strict_deduplication", "strict_increase"),
    ]
    for seed, spread in ((7, 60 * 24 * 10), (23, 60 * 12), (99, 60 * 48)):
        rows = _random_events(seed, spread_min=spread)
        sf = _write_and_point(spark, tmp_path, rows, f"cmb{seed}")
        load_tables(spark, sf)
        for combo in combos:
            mode_params = ", ".join(f"'{m}'" for m in combo)
            sql = translate(
                "SELECT depth, count() AS n_users FROM (SELECT user_id, "
                f"windowFunnel(3600, {mode_params})(ts, "
                "event_type = 'signup', event_type = 'view', "
                "event_type = 'purchase') AS depth "
                "FROM events GROUP BY user_id) WHERE depth >= 1 "
                "GROUP BY depth"
            )
            got = {r["depth"]: r["n_users"] for r in spark.sql(sql).collect()}
            want = _brute_combined_funnel(rows, set(combo))
            assert got == want, (seed, spread, combo)
    # The comma-joined single-string spelling is REJECTED loudly since
    # round 13 (ADVICE r12: real ClickHouse rejects it as an unknown
    # mode, so tolerating it would silently bless SQL that is invalid
    # upstream) — the error must name the separate-parameter spelling.
    import pytest

    from python_cdc_postgres_to_clickhouse_spark.dialect import DialectError

    with pytest.raises(DialectError, match="own parameter"):
        translate(
            "SELECT user_id, windowFunnel(3600, "
            "'strict_order,strict_increase')(ts, "
            "event_type = 'signup', event_type = 'view', "
            "event_type = 'purchase') AS depth FROM events GROUP BY user_id"
        )


def test_combined_funnel_divergence_frames(spark, tmp_path):
    """Hand-built frames where each combined mode differs from both of
    its constituent single modes — the composition is real, not one mode
    shadowing the other."""
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    base = dt.datetime(2024, 3, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)

    def depth(sf, modes):
        mode_params = ", ".join(f"'{m}'" for m in modes)
        sql = translate(
            "SELECT user_id, "
            f"windowFunnel(3600, {mode_params})(ts, "
            "event_type = 'signup', event_type = 'view', "
            "event_type = 'purchase') AS depth FROM events "
            "GROUP BY user_id"
        )
        return {r["user_id"]: r["depth"] for r in spark.sql(sql).collect()}

    # order+dedup: signup, view, view(dup -> r=2), purchase.
    # dedup alone: 2 (same); order alone: passes the dup view, reaches 3.
    rows = [
        (1, mins(0), 1, "signup", 1.0, "{}"),
        (2, mins(5), 1, "view", 1.0, "{}"),
        (3, mins(10), 1, "view", 1.0, "{}"),
        (4, mins(15), 1, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "cmb_od")
    load_tables(spark, sf)
    assert depth(sf, ["strict_order", "strict_deduplication"]) == {1: 2}
    assert depth(sf, ["strict_order"]) == {1: 3}
    assert depth(sf, ["strict_deduplication"]) == {1: 2}

    # order+increase: signup@0, view@0 (tie: blocked by increase),
    # click@5 (no-cond: breaks order scan), view@10, purchase@15.
    # increase alone: the click passes, view@10 advances -> 3.
    # order alone: the tie view@0 ADVANCES (no increase check) -> then
    # click breaks; depth 2.
    rows = [
        (1, mins(0), 2, "signup", 1.0, "{}"),
        (2, mins(0), 2, "view", 1.0, "{}"),
        (3, mins(5), 2, "click", 1.0, "{}"),
        (4, mins(10), 2, "view", 1.0, "{}"),
        (5, mins(15), 2, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "cmb_oi")
    load_tables(spark, sf)
    assert depth(sf, ["strict_order", "strict_increase"]) == {2: 1}
    assert depth(sf, ["strict_increase"]) == {2: 3}
    assert depth(sf, ["strict_order"]) == {2: 2}

    # dedup+increase: signup@0, view@0 (tie: blocked by increase),
    # view@5 (NOT a dup -- level 2 never recorded; advances), purchase@10.
    # dedup alone: view@0 advances, view@5 IS a dup -> r=2.
    rows = [
        (1, mins(0), 3, "signup", 1.0, "{}"),
        (2, mins(0), 3, "view", 1.0, "{}"),
        (3, mins(5), 3, "view", 1.0, "{}"),
        (4, mins(10), 3, "purchase", 1.0, "{}"),
    ]
    sf = _write_and_point(spark, tmp_path, rows, "cmb_di")
    load_tables(spark, sf)
    assert depth(sf, ["strict_deduplication", "strict_increase"]) == {3: 3}
    assert depth(sf, ["strict_deduplication"]) == {3: 2}
    assert depth(sf, ["strict_increase"]) == {3: 3}
