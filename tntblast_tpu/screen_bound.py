"""Constructive screening-slack bound (docs/screen_bound.md).

The screen drops a window when its DP score over the SCREENING table
(update_dp_param_screen: every fitted, zero-clamped event charge —
gap-adjacent terminal entries, interior LOOP pairs, BULGE extensions —
replaced by 0) fails `min_score - slack`.  Soundness needs, for the
alignment A* the engine reports:

    screen_path(A*, T) - exact(A*, T) <= slack        for all A*, T.

With zeroed event charges the screening path UNDERCHARGES every interior
event relative to the exact evaluator (whose loop/bulge penalties are
all >= 0 and whose loop-terminal swaps cancel exactly — the tstack files
are empty, so param_loop_terminal == param).  What remains are O(1)
LOCAL terms: AT closings, bulge closing stacks, the GT/TG double-wobble
special, terminal/frayed effects, per-event salt-folding deltas.  Those
are enumerated here NUMERICALLY, per family, from the actual tables: a
small alignment is built for every family instance, the exact side comes
from the native evaluator (the code under test), the screening-path side
from an exact walker over the int screening table, and the slack is the
max improvement observed over the full enumeration plus a truncation
margin.

This replaces the corpus-fitted constants 4.0/7.0, which were UNSOUND:
a mismatch cluster routed through gap pairs overcharges the ORIGINAL
table linearly in cluster size (measured improvement 5.16 kcal/mol at
size 6; unbounded in window length) — the screening-table fix removes
the event charges instead of bounding them.
"""

import functools

import numpy as np

NUM_BASE = 7
NUM_BP = 49
GAP = 6
E = 5

WC_PAIRS = [(0, 3), (3, 0), (1, 2), (2, 1)]
I_PAIRS = [(4, b) for b in range(5)] + [(b, 4) for b in range(4)]
MM_PAIRS = [(a, b) for a in range(4) for b in range(4) if a + b != 3]


def screen_path_dg(q_row, t_row, dg_int):
    """An upper bound on the screening-DP free energy reachable for this
    alignment: the charges align_dimer would apply along the path
    (melt_engine.cpp:371-452), SKIPPING the first pair's charge — the DP
    maximum always dominates the sub-path that starts at the alignment's
    second pair, whose first charge is exactly the (pair1 -> pair2)
    stack, i.e. this sum.  So screen_dp_dg <= screen_path_dg(A) for
    every alignment A of the window, independent of what precedes A.
    q_row/t_row may contain GAP codes."""
    dg = np.asarray(dg_int, dtype=np.int64).reshape(-1)

    def bp(a, b):
        return int(a) * NUM_BASE + int(b)

    n = len(q_row)
    score = 0
    prev_q = None     # None = first consumed position (charge skipped)
    prev_t = GAP
    for i in range(n):
        qc, tc = int(q_row[i]), int(t_row[i])
        if prev_q is None and (qc != GAP and tc != GAP):
            prev_q, prev_t = qc, tc        # first pair: no charge
            continue
        if qc == GAP:                      # Iq: consumes target
            # entry/extension collapse: the pushed charge is the one the
            # DP applied when entering this cell; next query base:
            nq = GAP
            for k in range(i + 1, n):
                if int(q_row[k]) != GAP:
                    nq = int(q_row[k])
                    break
            cur = bp(tc, GAP)
            first_of_run = i == 0 or int(q_row[i - 1]) != GAP
            pb = bp(prev_t, nq) if first_of_run else bp(prev_t, GAP)
            score -= dg[pb * NUM_BP + cur]
            prev_t = tc
        elif tc == GAP:                    # It: consumes query
            nt = GAP
            for k in range(i + 1, n):
                if int(t_row[k]) != GAP:
                    nt = int(t_row[k])
                    break
            cur = bp(GAP, qc)
            first_of_run = i == 0 or int(t_row[i - 1]) != GAP
            pb = bp(nt, prev_q) if first_of_run else bp(GAP, prev_q)
            score -= dg[pb * NUM_BP + cur]
            prev_q = qc
        else:                              # M: consumes both
            cur = bp(tc, qc)
            pb = bp(prev_t, prev_q)
            score -= dg[pb * NUM_BP + cur]
            prev_q, prev_t = qc, tc
    return -score / 10000.0


def _family_alignments(dangle):
    """Small alignments covering every local event family.  Flanking
    context is exhaustive where the family formula depends on it."""
    out = []

    def A(qs, ts):
        out.append((np.array(qs, np.uint8), np.array(ts, np.uint8)))

    GC = (2, 1)
    # pure duplexes incl. AT terminals (AT-closing + terminal charges)
    for L in WC_PAIRS + I_PAIRS:
        for R in WC_PAIRS + I_PAIRS:
            A([L[0], 2, 1, R[0]], [L[1], 1, 2, R[1]])
    # gapless mismatch clusters m = 1..12, all flanking mm pairs
    for m in (1, 2, 3, 4, 8, 12):
        for M1 in MM_PAIRS:
            for Mm in MM_PAIRS:
                mid = [(0, 0)] * max(0, m - 2)
                mms = [M1] + mid + ([Mm] if m > 1 else [])
                qs = [2, 1] + [p[0] for p in mms] + [2, 1]
                ts = [1, 2] + [p[1] for p in mms] + [1, 2]
                A(qs, ts)
    # bulges k = 1..6 on each strand, all WC flanks, bulge base choices
    for k in (1, 2, 3, 6):
        for L in WC_PAIRS:
            for R in WC_PAIRS:
                for B in range(4):
                    gq = [GAP] * k
                    gb = [B] * k
                    A([2, L[0]] + gq + [R[0], 1],
                      [1, L[1]] + gb + [R[1], 2])
                    A([2, L[0]] + gb + [R[0], 1],
                      [1, L[1]] + gq + [R[1], 2])
    # asymmetric / mixed loops: mm x gaps in several arrangements
    for mm in (1, 2, 3):
        for g in (1, 2, 3):
            for M1 in ((0, 0), (2, 2), (3, 2)):
                mpart_q = [M1[0]] * mm
                mpart_t = [M1[1]] * mm
                A([2, 1] + mpart_q + [GAP] * g + [2, 1],
                  [1, 2] + mpart_t + [0] * g + [1, 2])
                A([2, 1] + [GAP] * g + mpart_q + [2, 1],
                  [1, 2] + [0] * g + mpart_t + [1, 2])
                A([2, 1] + mpart_q + [0] * g + [2, 1],
                  [1, 2] + mpart_t + [GAP] * g + [1, 2])
                # gaps on both strands (gap_difference = 0 loop)
                A([2, 1] + mpart_q + [GAP] * g + [0] * g + [2, 1],
                  [1, 2] + mpart_t + [0] * g + [GAP] * g + [1, 2])
    # GT/TG double-wobble special (loop_size == 2 via equal gaps)
    for w1 in ((2, 3), (3, 2)):
        for w2 in ((2, 3), (3, 2)):
            A([2, w1[0], GAP, 0, w2[0], 1],
              [1, w1[1], 0, GAP, w2[1], 2])
    if dangle:
        # dangling-end / frayed-end attachments: E-paired terminals
        for D in range(4):
            for L in WC_PAIRS:
                A([E, L[0], 2, 1], [D, L[1], 1, 2])
                A([D, L[0], 2, 1], [E, L[1], 1, 2])
                A([2, 1, L[0], E], [1, 2, L[1], D])
                A([2, 1, L[0], D], [1, 2, L[1], E])
                # frayed: mismatch terminal followed by the attach pair
                for M1 in MM_PAIRS[:6]:
                    A([M1[0], L[0], 2, 1], [M1[1], L[1], 1, 2])
    return out


@functools.lru_cache(maxsize=None)
def _bound_cached(key):
    engine_id, T, dangle = key
    eng = _ENGINES[engine_id]
    return _compute_bound(eng, T, dangle)


_ENGINES = {}


def _compute_bound(engine, T, dangle):
    dg = engine.delta_g_screen(np.float32(T)).astype(np.int64).reshape(-1)
    aligns = _family_alignments(dangle)
    tm, dH, dS, ok = engine.eval_alignments(
        [q for q, _ in aligns], [t for _, t in aligns],
        np.full(len(aligns), 9e-7, dtype=np.float32))
    def wc_core(q, t):
        """The DP path underlying a reported alignment is its WC-trimmed
        core (frayed ends are trimmed before evaluation, dangling ends
        attached after; neither is charged by the path the screen DP can
        realize)."""
        def wc(a, b):
            return (a == 4) | (b == 4) | (a + b == 3)
        lo, hi = 0, len(q) - 1
        while hi >= lo and not (q[lo] < 5 and t[lo] < 5
                                and wc(int(q[lo]), int(t[lo]))):
            lo += 1
        while hi >= lo and not (q[hi] < 5 and t[hi] < 5
                                and wc(int(q[hi]), int(t[hi]))):
            hi -= 1
        return q[lo:hi + 1], t[lo:hi + 1]

    worst = 0.0
    for k, (q, t) in enumerate(aligns):
        if not ok[k]:
            # evaluate_alignment rejected (dH >= 0): the engine reports
            # tm = 0 for such alignments — they can never be a hit under
            # a min_tm > 0 / max_dg < 0 criterion, so the invariant is
            # vacuous for them
            continue
        qc, tc = wc_core(q, t)
        if len(qc) == 0:
            continue
        path = screen_path_dg(qc, tc, dg)
        exact = float(dH[k]) - T * float(dS[k])
        worst = max(worst, path - exact)
    # margins: int truncation (<= 1e-4 per charge, <= 64 charges), f32
    # eval rounding, enumeration granularity
    return worst + 0.05


def slack_bound(engine, T, dangle=False):
    """Provable screening slack at temperature T (kcal/mol): the maximum
    over all enumerated event families of screen_path - exact, plus a
    truncation margin.  Events compose additively (each family term is
    the event's complete local contribution), interior event charges are
    zero by construction, and every exact interior penalty is >= 0 — so
    the per-alignment improvement is bounded by the worst single-event
    terms captured here (see docs/screen_bound.md for the argument)."""
    eid = id(engine)
    _ENGINES[eid] = engine
    return _bound_cached((eid, round(float(T), 4), bool(dangle)))
