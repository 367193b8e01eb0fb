"""Constructive screening-slack bound (screen_bound.py): the computed
per-family maxima, the end-to-end invariant over adversarial windows,
and the demonstration that the OLD corpus-fitted constants were unsound
(the bug that motivated the screening-table redesign)."""

import numpy as np
import pytest

from tntblast_tpu import native
from tntblast_tpu.screen_bound import slack_bound

TS = (283.15, 310.15, 313.15, 333.15, 353.15)


@pytest.fixture(scope="module")
def engine():
    return native.MeltEngine(n_threads=1)


def test_bound_values_small(engine):
    """The constructive bound must stay far below the 1.0 constant the
    native host screen uses (frag_search.cpp)."""
    for T in TS:
        for dangle in (False, True):
            b = slack_bound(engine, T, dangle)
            assert 0 <= b <= 0.9, (T, dangle, b)


def _adversarial_windows(rng, n):
    """Anchored mismatch clusters + random junk: the class that broke the
    old bound (gap-routed cluster crossings)."""
    cases = []
    for _ in range(n):
        anchor = int(rng.integers(6, 14))
        m = int(rng.integers(0, 11))
        q = rng.integers(0, 4, 2 * anchor + m).astype(np.uint8)
        t = (3 - q).astype(np.uint8)
        for k in range(anchor, anchor + m):
            choices = [c for c in range(4) if c != 3 - q[k]]
            t[k] = choices[rng.integers(0, len(choices))]
        # extra scattered mutations
        for _ in range(int(rng.integers(0, 4))):
            pos = int(rng.integers(0, len(t)))
            t[pos] = rng.integers(0, 4)
        cases.append((q, t[::-1].copy()))
    return cases


def test_invariant_screen_dp_vs_exact(engine):
    """screen_dp(T) - exact(A*, T) <= slack for the reported alignment,
    over adversarial + random windows at several temperatures.  This is
    the exact soundness condition the screen relies on
    (docs/screen_bound.md); the OLD real-table screen violates it (see
    test_old_screen_constants_were_unsound)."""
    from tntblast_tpu.ops.thermo_dp import dp_max_score

    rng = np.random.default_rng(3)
    cases = _adversarial_windows(rng, 120)
    qs = [q for q, _ in cases]
    ts = [t for _, t in cases]
    ref = engine.eval_batch(native.HETERO, qs, ts,
                            np.full(len(cases), 9e-7, dtype=np.float32))

    for T in (310.15, 313.15, 333.15):
        dg_scr = engine.delta_g_screen(np.float32(T)).astype(
            np.int32).reshape(-1)
        slack = slack_bound(engine, T, False)
        wq = max(len(q) for q in qs)
        wt = max(len(t) for t in ts)
        qc = np.zeros((len(cases), wq), np.int32)
        ql = np.zeros(len(cases), np.int32)
        tc = np.zeros((len(cases), wt), np.int32)
        tl = np.zeros(len(cases), np.int32)
        for i, (q, t) in enumerate(cases):
            qc[i, :len(q)] = q
            ql[i] = len(q)
            tc[i, :len(t)] = t
            tl[i] = len(t)
        score = np.asarray(dp_max_score(qc, ql, tc, tl, dg_scr,
                                        wq=wq, wt=wt))
        for i in range(len(cases)):
            if not ref["valid"][i]:
                continue
            screen_dp_dg = -float(score[i]) / 10000.0
            exact = float(ref["dH"][i]) - T * float(ref["dS"][i])
            assert screen_dp_dg - exact <= slack + 1e-6, (
                i, T, screen_dp_dg, exact, slack)


def test_old_screen_constants_were_unsound(engine):
    """Regression documentation: over the REAL dp table the corpus-fitted
    slack 4.0 is violated by a mismatch cluster the DP routes through
    gap pairs — the screen would have silently dropped a true hit.  The
    screening-table redesign exists because of this case."""
    rng = np.random.default_rng(0)
    worst = 0.0
    for trial in range(60):
        anchor = 12
        m = 6
        q = rng.integers(0, 4, 2 * anchor + m).astype(np.uint8)
        t = (3 - q).astype(np.uint8)
        for k in range(anchor, anchor + m):
            choices = [c for c in range(4) if c != 3 - q[k]]
            t[k] = choices[rng.integers(0, len(choices))]
        w = t[::-1].copy()
        res = engine.eval_batch(native.HETERO, [q], [w],
                                np.array([9e-7], np.float32))
        if not res["valid"][0]:
            continue
        imp = float(res["dp_dg"][0]) - float(res["dg"][0])
        worst = max(worst, imp)
    assert worst > 4.0, worst


def test_screen_dp_numpy_matches_production(engine):
    """screen_bound._screen_dp_batch (the JAX-free mirror used by the
    composition-premise assert) must agree exactly with the production
    kernel ops.thermo_dp.dp_max_score on the screening table."""
    from tntblast_tpu.ops.thermo_dp import dp_max_score
    from tntblast_tpu.screen_bound import _screen_dp_batch

    rng = np.random.default_rng(9)
    qs, ts = [], []
    for _ in range(40):
        q = rng.integers(0, 4, rng.integers(6, 30)).astype(np.int64)
        t = rng.integers(0, 4, rng.integers(6, 40)).astype(np.int64)
        qs.append(q)
        ts.append(t)
    for T in (283.15, 310.15):
        dg = engine.delta_g_screen(np.float32(T)).astype(
            np.int32).reshape(-1)
        mine = _screen_dp_batch(qs, ts, dg)
        wq = max(len(q) for q in qs)
        wt = max(len(t) for t in ts)
        qc = np.zeros((len(qs), wq), np.int32)
        tc = np.zeros((len(qs), wt), np.int32)
        ql = np.array([len(q) for q in qs], np.int32)
        tl = np.array([len(t) for t in ts], np.int32)
        for i in range(len(qs)):
            qc[i, :ql[i]] = qs[i]
            tc[i, :tl[i]] = ts[i]
        prod = np.asarray(dp_max_score(qc, ql, tc, tl, dg, wq=wq, wt=wt))
        np.testing.assert_array_equal(mine, prod.astype(np.int64))


def _multi_event_windows(rng, n):
    """Separated interior events (bulges, mismatch runs, wobbles) between
    WC anchors: the composition-premise adversaries (ADVICE r4 — the
    single-event slack must survive event repetition)."""
    cases = []
    for _ in range(n):
        n_events = int(rng.integers(2, 6))
        q, t = [], []
        anchor = int(rng.integers(4, 9))
        aq = list(rng.integers(0, 4, anchor))
        q += aq
        t += [3 - c for c in aq]
        for _ in range(n_events):
            kind = rng.integers(0, 3)
            if kind == 0:              # bulge (query or target side)
                k = int(rng.integers(1, 4))
                if rng.integers(0, 2):
                    q += [6] * k
                    t += list(rng.integers(0, 4, k))
                else:
                    q += list(rng.integers(0, 4, k))
                    t += [6] * k
            elif kind == 1:            # mismatch run
                m = int(rng.integers(1, 4))
                for _ in range(m):
                    a = int(rng.integers(0, 4))
                    choices = [c for c in range(4) if c != 3 - a]
                    q.append(a)
                    t.append(int(rng.choice(choices)))
            else:                      # G.T / T.G wobble
                w = (2, 3) if rng.integers(0, 2) else (3, 2)
                q.append(w[0])
                t.append(w[1])
            anchor = int(rng.integers(3, 8))
            aq = list(rng.integers(0, 4, anchor))
            q += aq
            t += [3 - c for c in aq]
        qa = np.array([c for c in q if c != 6], np.uint8)
        ta = np.array([c for c in t if c != 6], np.uint8)[::-1].copy()
        cases.append((qa, ta))
    return cases


def test_invariant_screen_dp_vs_exact_multi_event(engine):
    """The soundness invariant under event REPETITION: windows whose
    best alignments contain several separated interior events (bulges,
    clusters, wobbles) must still satisfy screen_dp - exact <= slack —
    per-event overcharges must not compose (docs/screen_bound.md
    step 3)."""
    from tntblast_tpu.ops.thermo_dp import dp_max_score

    rng = np.random.default_rng(17)
    cases = _multi_event_windows(rng, 150)
    ref = engine.eval_batch(native.HETERO,
                            [q for q, _ in cases], [t for _, t in cases],
                            np.full(len(cases), 9e-7, dtype=np.float32))
    for T in (283.15, 310.15, 333.15):
        dg_scr = engine.delta_g_screen(np.float32(T)).astype(
            np.int32).reshape(-1)
        slack = slack_bound(engine, T, False)
        wq = max(len(q) for q, _ in cases)
        wt = max(len(t) for _, t in cases)
        qc = np.zeros((len(cases), wq), np.int32)
        ql = np.zeros(len(cases), np.int32)
        tc = np.zeros((len(cases), wt), np.int32)
        tl = np.zeros(len(cases), np.int32)
        for i, (q, t) in enumerate(cases):
            qc[i, :len(q)] = q
            ql[i] = len(q)
            tc[i, :len(t)] = t
            tl[i] = len(t)
        score = np.asarray(dp_max_score(qc, ql, tc, tl, dg_scr,
                                        wq=wq, wt=wt))
        for i in range(len(cases)):
            if not ref["valid"][i]:
                continue
            screen_dp_dg = -float(score[i]) / 10000.0
            exact = float(ref["dH"][i]) - T * float(ref["dS"][i])
            assert screen_dp_dg - exact <= slack + 1e-6, (
                i, T, screen_dp_dg, exact, slack)
