"""Device-side exact evaluation of gapless duplex alignments.

The reference pipeline evaluates every surviving candidate window with
align_dimer -> traceback -> evaluate_alignment (reference
nuc_cruc.cpp:492-2299).  For the overwhelming majority of seeded windows
the optimal alignment is a UNIQUE, strictly-diagonal (gapless) path; this
module reproduces, bit-exactly, what the host engine reports for that
class — so the device can own the evaluation and the host only re-runs
the full machinery for the few windows that are either untrusted
(co-optimal paths, gaps, zero-score cells, stale-buffer hazards) or
final hits (which need the rendered alignment string).

Trust conditions (each checked on device; any failure routes the window
to the host):

  * the window is full (not clipped by a fragment edge) and contains only
    {A,C,G,T,I} bases (handled upstream: needs_host),
  * dangling ends are disabled (--dangle5/--dangle3 off),
  * the DP has a UNIQUE maximum cell,
  * the traceback from it is strictly diagonal — at every followed cell
    the M-state diagonal predecessor strictly beats the Iq/It
    predecessors (no trace branch bits; reference nuc_cruc.cpp:1409-1618
    enumerates every branch),
  * no zero-score cell on the path (the reference re-enumerates truncated
    sub-paths at score-0 cells),
  * the walk terminates in the matrix interior or at column 0 — a path
    that reaches DP row 0 reads a stale query-buffer slot (reference
    NucCruc behavior, melt_engine.cpp header) whose value depends on
    engine history the device cannot know.

For a trusted path, evaluate_alignment (nuc_cruc.cpp:1620-2299)
restricted to gapless alignments reduces to:

  * init_H/init_S + ordered per-position stack sums,
  * AT-closing penalties at the 5'-most and 3'-most WC terminals,
  * internal-loop corrections for mismatch clusters of length m >= 2:
    dS += loop_S[2m]; the two flanking stacks are replaced by
    loop-terminal parameters (the GT/TG double-wobble special needs
    loop_size == 2, impossible without gaps),
  * the frayed-end trim before evaluation (non-WC terminal pairs popped),
  * salt: dS += SALT * (num_base/2 - 1) * ln[Na+], counting non-loop
    bases,
  * Tm = dH / (R * ln(Ct) + dS) - 273.15, clamped at 0, requires dH < 0.

float32 accumulation ORDER matches the reference exactly (position by
position, code order within a position), so dH/dS/Tm are bit-identical
to the host engine's.

This module is the numpy reference (unit-tested against the native
engine); ops/eval_gapless_jax.py holds the jit version used by the
device panel step.
"""

import numpy as np

NC_R = np.float32(1.9872e-3)      # reference nuc_cruc.h:33
NC_ZERO_C = np.float32(273.15)
NUM_BASE = 7
NUM_BP = 49
GAP = 6

f32 = np.float32


def is_comp5(q, t):
    """is_comp_base on the concrete {A,C,G,T,I} domain
    (melt_engine.cpp init_complement_sets)."""
    return (q == 4) | (t == 4) | (q + t == 3)


def wc5(q, t):
    """watson_and_crick[bp(q,t)] on the concrete domain."""
    return (q == 4) | (t == 4) | (q + t == 3)


def build_slot_eval_tables(q_codes, tables):
    """Per-slot eval lookup tables from the thermo parameter set.

    q_codes: (ql,) int query melt codes in {0..4} (5'->3')
    tables:  santa_lucia.ThermoParams
    Returns dict of numpy arrays:
      Hstk/Sstk:   (ql, 25) f32 — stack param for alignment position with
                   query base q[qi], prev query base q[qi-1], indexed by
                   tprev*5 + tcur (row 0 unused)
      Hlt/Slt:     (ql, 25) f32 — loop-terminal params, same indexing
    """
    H = np.asarray(tables.param_H, dtype=np.float32).reshape(-1)
    S = np.asarray(tables.param_S, dtype=np.float32).reshape(-1)
    LH = np.asarray(tables.param_loop_terminal_H,
                    dtype=np.float32).reshape(-1)
    LS = np.asarray(tables.param_loop_terminal_S,
                    dtype=np.float32).reshape(-1)
    ql = len(q_codes)
    out = {k: np.zeros((ql, 25), dtype=np.float32)
           for k in ("Hstk", "Sstk", "Hlt", "Slt")}
    for qi in range(1, ql):
        qb = int(q_codes[qi])
        pq = int(q_codes[qi - 1])
        for tp in range(5):
            for tc in range(5):
                last_bp = pq * NUM_BASE + tp
                cur_bp = qb * NUM_BASE + tc
                idx = last_bp * NUM_BP + cur_bp
                out["Hstk"][qi, tp * 5 + tc] = H[idx]
                out["Sstk"][qi, tp * 5 + tc] = S[idx]
                out["Hlt"][qi, tp * 5 + tc] = LH[idx]
                out["Slt"][qi, tp * 5 + tc] = LS[idx]
    return out


def evaluate_gapless_np(q_codes, t_codes, qi0, qi1, ti_of_qi0, tables,
                        eval_tabs=None):
    """Reference-shadowing scalar evaluation of ONE gapless path.

    q_codes: (ql,) query melt codes 5'->3'
    t_codes: (wt,) oriented window melt codes
    qi0/qi1: inclusive query-index range of the UNTRIMMED path
             (qi = fm_q at the 5' end)
    ti_of_qi0: window target index aligned with qi0 (anti-diagonal:
             ti(qi) = ti_of_qi0 - (qi - qi0))
    tables:  santa_lucia.ThermoParams

    Returns dict with tm, dH, dS, num_base, fm_q, fm_t, lm_q, lm_t, mm,
    align_len, ok (dH < 0 and align_len >= 3) — all post-trim, matching
    enumerate_dimer_alignments + evaluate_alignment for HETERO_DIMER with
    dangling ends off.  Salt/Tm are computed exactly as the native code
    (double log, f32 everything else).
    """
    q = np.asarray(q_codes, dtype=np.int64)
    t = np.asarray(t_codes, dtype=np.int64)

    # pairs of the untrimmed path, alignment order (5'q -> 3'q)
    qis = np.arange(qi0, qi1 + 1)
    tis = ti_of_qi0 - (qis - qi0)
    pq = q[qis]
    pt = t[tis]

    # frayed-end trim (reference nuc_cruc.cpp:1485-1499): the alignment
    # deque is built 3'->5' of the query, so the BACK of the deque is the
    # low-qi end; trimming both while non-WC
    lo, hi = 0, len(qis) - 1
    while hi >= lo and not wc5(pq[lo], pt[lo]):
        lo += 1
    while hi >= lo and not wc5(pq[hi], pt[hi]):
        hi -= 1
    align_len = hi - lo + 1
    res = {
        "fm_q": int(qis[lo]) if align_len > 0 else int(qi0),
        "fm_t": int(tis[lo]) if align_len > 0 else int(ti_of_qi0),
        "lm_q": int(qis[hi]) if align_len > 0 else int(qi1),
        "lm_t": int(tis[hi]) if align_len > 0 else int(
            ti_of_qi0 - (qi1 - qi0)),
        "align_len": align_len,
        "ok": False, "tm": f32(0.0), "dH": f32(0.0), "dS": f32(0.0),
        "num_base": 0, "mm": 0,
    }
    if align_len < 3:
        return res

    pq = pq[lo:hi + 1]
    pt = pt[lo:hi + 1]
    n = align_len
    tt = tables

    AT = 0 * NUM_BASE + 3
    TA = 3 * NUM_BASE + 0

    dH = f32(tt.param_init_H)
    dS = f32(tt.param_init_S)
    num_base = 0
    num_mismatch = 0
    terminal_5 = False
    terminal_bp = GAP * NUM_BASE + GAP

    H = np.asarray(tt.param_H, dtype=np.float32).reshape(-1)
    S = np.asarray(tt.param_S, dtype=np.float32).reshape(-1)
    LH = np.asarray(tt.param_loop_terminal_H, dtype=np.float32).reshape(-1)
    LS = np.asarray(tt.param_loop_terminal_S, dtype=np.float32).reshape(-1)
    loop_S = np.asarray(tt.param_loop_S, dtype=np.float32)

    def bp(a, b):
        return int(a) * NUM_BASE + int(b)

    cur_bp = bp(pq[0], pt[0])
    if wc5(pq[0], pt[0]):
        terminal_5 = True
        if cur_bp in (AT, TA):
            dH = f32(dH + f32(tt.param_AT_closing_H))
            dS = f32(dS + f32(tt.param_AT_closing_S))
    num_base += 2
    last_wc_ai = 0          # alignment index of the last WC pair seen

    for ai in range(1, n):
        last_bp = cur_bp
        cur_bp = bp(pq[ai], pt[ai])
        cur_wc = wc5(pq[ai], pt[ai])
        last_wc = wc5(pq[ai - 1], pt[ai - 1])

        in_loop = (not last_wc) and (not cur_wc)
        if not in_loop:
            dH = f32(dH + H[last_bp * NUM_BP + cur_bp])
            dS = f32(dS + S[last_bp * NUM_BP + cur_bp])
            num_base += 2

        if cur_wc:
            terminal_bp = cur_bp
            if not terminal_5:
                terminal_5 = True
                if cur_bp in (AT, TA):
                    dH = f32(dH + f32(tt.param_AT_closing_H))
                    dS = f32(dS + f32(tt.param_AT_closing_S))
            if num_mismatch > 1:
                # closing an internal loop (gapless: loop_size = 2*mm,
                # always >= 4, so the GT/TG special can't fire)
                loop_size = 2 * num_mismatch
                dS = f32(dS + loop_S[loop_size])
                dS = f32(dS + f32(0) * f32(tt.param_asymmetric_loop_dS))
                # right side: replace the just-added stack
                dH = f32(dH - H[last_bp * NUM_BP + cur_bp])
                dS = f32(dS - S[last_bp * NUM_BP + cur_bp])
                dH = f32(dH + LH[last_bp * NUM_BP + cur_bp])
                dS = f32(dS + LS[last_bp * NUM_BP + cur_bp])
                # left side: walk back to the closest WC pair
                lhs = last_wc_ai
                pm_bp = bp(pq[lhs], pt[lhs])
                mm_bp = bp(pq[lhs + 1], pt[lhs + 1])
                dH = f32(dH - H[pm_bp * NUM_BP + mm_bp])
                dS = f32(dS - S[pm_bp * NUM_BP + mm_bp])
                dH = f32(dH + LH[pm_bp * NUM_BP + mm_bp])
                dS = f32(dS + LS[pm_bp * NUM_BP + mm_bp])
                # rhs_q != lhs_q and rhs_t != lhs_t (mm >= 2)
                num_base += 2
            num_mismatch = 0
            last_wc_ai = ai
        else:
            num_mismatch += 1

    if terminal_bp in (AT, TA):
        dH = f32(dH + f32(tt.param_AT_closing_H))
        dS = f32(dS + f32(tt.param_AT_closing_S))

    mm_in_align = int(sum(0 if is_comp5(int(a), int(b)) else 1
                          for a, b in zip(pq, pt)))
    res["mm"] = mm_in_align
    res["num_base"] = num_base
    res["dH"] = f32(dH)
    res["dS"] = f32(dS)
    res["ok"] = bool(dH < 0.0)
    return res


def finish_eval(dH, dS, num_base, na, strand_conc):
    """Salt + Tm exactly as evaluate_alignment's tail
    (melt_engine.cpp:1382-1391).  Every operation is float32: `na` and
    `strand_conc` are float members, so the C++ `log(...)` calls resolve
    to the float overload and the whole expression stays f32."""
    import math
    salt_f32 = f32(f32(0.368e-3) * f32(f32(0.5) * f32(num_base) - f32(1)))
    dS = f32(dS + f32(salt_f32 * f32(math.log(f32(na)))))
    denom = f32(f32(NC_R * f32(math.log(f32(strand_conc)))) + dS)
    tm = f32(f32(dH / denom) - NC_ZERO_C)
    return f32(max(f32(0.0), tm)), dS


def trusted_path_np(q_codes, t_codes, delta_g):
    """Reference walk: run the exact int DP (align_dimer semantics) and
    decide whether the window's reported alignment is a trusted gapless
    path (see module docstring).  numpy scalar version — the ground truth
    for the jit implementation and for tests.

    Returns (status, qi0, qi1, ti0) where status is one of
      "trusted"   — unique strictly-diagonal path; [qi0, qi1] query range
                    (untrimmed), ti0 = window index aligned with qi0
      "no_align"  — max DP score < 0: the engine reports tm = 0
      "host"      — untrusted; the host must evaluate this window
    """
    q = np.asarray(q_codes, dtype=np.int64)
    t = np.asarray(t_codes, dtype=np.int64)
    ql, tl = len(q), len(t)
    dg = np.asarray(delta_g, dtype=np.int64).reshape(-1)

    def bp(a, b):
        return int(a) * NUM_BASE + int(b)

    NEG = -1
    M = np.full((ql + 1, tl + 1), NEG, dtype=np.int64)
    Iq = np.full((ql + 1, tl + 1), NEG, dtype=np.int64)
    It = np.full((ql + 1, tl + 1), NEG, dtype=np.int64)
    relu = lambda x: max(0, x)   # noqa: E731

    for i in range(1, ql + 1):
        qb = q[ql - i]
        pq = GAP if i == 1 else q[ql - (i - 1)]
        for j in range(1, tl + 1):
            tb = t[j - 1]
            pt = GAP if j == 1 else t[j - 2]
            cur = bp(tb, qb)
            d1 = relu(M[i-1, j-1]) - dg[bp(pt, pq) * NUM_BP + cur]
            d2 = relu(Iq[i-1, j-1]) - dg[bp(pt, GAP) * NUM_BP + cur]
            d3 = relu(It[i-1, j-1]) - dg[bp(GAP, pq) * NUM_BP + cur]
            M[i, j] = max(d1, d2, d3)
            cg = bp(tb, GAP)
            Iq[i, j] = max(relu(M[i, j-1]) - dg[bp(pt, qb) * NUM_BP + cg],
                           relu(Iq[i, j-1]) - dg[bp(pt, GAP) * NUM_BP + cg])
            cg = bp(GAP, qb)
            It[i, j] = max(relu(M[i-1, j]) - dg[bp(tb, pq) * NUM_BP + cg],
                           relu(It[i-1, j]) - dg[bp(GAP, pq) * NUM_BP + cg])

    best = M[1:, 1:].max() if ql and tl else -1
    if best < 0:
        return "no_align", 0, 0, 0
    cells = np.argwhere(M[1:, 1:] == best)
    if len(cells) != 1:
        return "host", 0, 0, 0
    i_s, j_s = int(cells[0][0]) + 1, int(cells[0][1]) + 1

    s = 0
    while True:
        i, j = i_s - s, j_s - s
        if j < 1:
            path_end = s - 1            # stop without push
            break
        v = M[i, j]
        if v < 0:
            if i < 1:
                return "host", 0, 0, 0  # row-0 stale-slot push
            path_end = s                # terminal pair pushed
            break
        if v == 0:
            return "host", 0, 0, 0      # zero-score sub-path enumeration
        # strictness: the trace at this cell must be uniquely diagonal
        qb = q[ql - i]
        pq = GAP if i == 1 else q[ql - (i - 1)]
        tb = t[j - 1]
        pt = GAP if j == 1 else t[j - 2]
        cur = bp(tb, qb)
        d1 = relu(M[i-1, j-1]) - dg[bp(pt, pq) * NUM_BP + cur]
        d2 = relu(Iq[i-1, j-1]) - dg[bp(pt, GAP) * NUM_BP + cur]
        d3 = relu(It[i-1, j-1]) - dg[bp(GAP, pq) * NUM_BP + cur]
        if not (d1 > d2 and d1 > d3):
            return "host", 0, 0, 0
        s += 1

    qi0 = ql - i_s
    return "trusted", qi0, qi0 + path_end, j_s - 1
