"""jit evaluation of gapless duplex alignments for one panel slot.

Vectorized port of ops/eval_gapless.py (see that module's docstring for
the trust conditions and the evaluate_alignment reduction; reference
nuc_cruc.cpp:973-2299).  Runs on the per-slot segment of the device
panel step: the slot's query codes and eval tables are compile-time
constants, the batch axis is the slot's candidate windows.

Trust is decided WITHOUT reading trace bits: a "gapped-best" DP channel
Mg tracks the best M-state score over paths that used at least one gap
transition (no relu restart — a restart begins a new, gapless path).
Mg_max < best proves no gap-using path ties the optimum anywhere, which
is exactly the absence of branch bits at every cell the reference
traceback can visit (a gapped co-optimal path would merge with the
walked diagonal at some visited cell, putting a tie there).  Combined
with a unique maximum cell this makes the reported alignment THE strict
diagonal run through the max cell; zero-score and stale-row-0 hazards
are read off the M values along that diagonal.

All float32 accumulation happens in a lax.scan over query positions with
the adds issued in the reference's code order — bit-identical dH/dS.
"""

import numpy as np

from tntblast_tpu.jaxconf import configure as _jaxconf
_jaxconf()

import jax
import jax.numpy as jnp

NUM_BASE = 7
NUM_BP = 49
GAP = 6
NEG_INF = jnp.int32(-(1 << 29))


def wc5(q, t):
    return (q == 4) | (t == 4) | (q + t == 3)


def build_slot_eval_arrays(q_codes, tables):
    """Static per-slot arrays for eval_segment (numpy, folded at trace)."""
    from tntblast_tpu.ops.eval_gapless import build_slot_eval_tables
    tabs = build_slot_eval_tables(np.asarray(q_codes, dtype=np.int64),
                                  tables)
    ql = len(q_codes)
    loop2m = np.zeros(ql + 1, dtype=np.float32)
    ls = np.asarray(tables.param_loop_S, dtype=np.float32)
    for m in range(2, ql + 1):
        loop2m[m] = ls[2 * m]
    tabs["loop2m"] = loop2m
    tabs["AT_H"] = np.float32(tables.param_AT_closing_H)
    tabs["AT_S"] = np.float32(tables.param_AT_closing_S)
    tabs["init_H"] = np.float32(tables.param_init_H)
    tabs["init_S"] = np.float32(tables.param_init_S)
    tabs["q"] = tuple(int(c) for c in q_codes)
    return tabs


def eval_segment(M_rows, mg_max, tcodes, tabs):
    """Trusted-path decision + exact evaluation for one slot segment.

    M_rows: (ql, Bs, wt+1) int32 — full-DP M rows at the ENGINE
        temperature (row r = DP row r+1; column 0 = boundary -1)
    mg_max: (Bs,) int32 — max over all cells of the gapped-best channel
    tcodes: (Bs, wt) int32 oriented window codes in {0..4}
    tabs:   build_slot_eval_arrays output (q = static query tuple)

    Returns dict of (Bs,) arrays — see module docstring of eval_gapless
    for field semantics.  Fields are only meaningful where trusted.
    """
    ql, Bs, wtp1 = M_rows.shape
    wt = wtp1 - 1
    # q may be a static tuple (per-slot call) or a traced (ql,) array
    # (shape-grouped vmap over slots in the panel step)
    q = jnp.asarray(tabs["q"], dtype=jnp.int32)

    # ---- best cell + uniqueness ----------------------------------------
    flatM = jnp.moveaxis(M_rows, 1, 0).reshape(Bs, ql * wtp1)
    best = jnp.max(flatM, axis=1)
    n_best = jnp.sum(flatM == best[:, None], axis=1)
    amax = jnp.argmax(flatM, axis=1).astype(jnp.int32)
    r_star = amax // wtp1
    j_star = amax % wtp1
    i_star = r_star + 1
    no_align = best < 0
    unique = (n_best == 1) & ~no_align
    no_gap_tie = mg_max < best

    qi0 = ql - i_star
    A = qi0 + (j_star - 1)                  # qi + ti = A on the diagonal

    # ---- M values along the path diagonal, in qi-space ------------------
    # cell of qi: (i, j) = (ql - qi, A - qi + 1); shift each DP row so the
    # anti-diagonal becomes a contiguous column, then one consecutive
    # slice gather per window.
    # M_sh[b, cc, r] = M(r+1, cc - ql + r) with cc = (j - r) + ql
    KK = wtp1 + ql
    cols = []
    for r in range(ql):
        row = M_rows[r]                       # (Bs, wtp1)
        left = jnp.full((Bs, ql - r), -1, jnp.int32)
        right = jnp.full((Bs, r), -1, jnp.int32)
        cols.append(jnp.concatenate([left, row, right], axis=1))
    M_sh = jnp.stack(cols, axis=2)            # (Bs, KK, ql)
    # column cc* = (j* - i* + 1) + ql; row r of that column = DP row r+1,
    # i.e. qi = ql - 1 - r -> Mdiag_by_r[r] = M at qi = ql-1-r
    cc = (j_star - i_star + 1) + ql
    Mcol = jnp.take_along_axis(
        M_sh, cc[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
    Mdiag = jnp.flip(Mcol, axis=1)            # (Bs, ql) indexed by qi

    qs = jnp.arange(ql, dtype=jnp.int32)[None, :]
    in_walk = (qs >= qi0[:, None]) & (qs <= jnp.minimum(
        ql - 1, A[:, None]))
    neg_here = in_walk & (Mdiag < 0)
    qi_neg = jnp.min(jnp.where(neg_here, qs, ql), axis=1)
    has_neg = qi_neg < ql
    walk_hi = jnp.minimum(ql - 1, A)
    qi1 = jnp.where(has_neg, qi_neg, walk_hi)
    row0_stale = (~has_neg) & (A > ql - 1)
    visited = (qs >= qi0[:, None]) & (qs <= qi1[:, None])
    no_zero = jnp.all(jnp.where(visited & (Mdiag >= 0), Mdiag != 0, True),
                      axis=1)

    trusted = no_align | (unique & no_gap_tie & ~row0_stale & no_zero)

    # ---- window codes along the diagonal: tq[qi] = t[A - qi] ------------
    start = A - (ql - 1)
    jj = jnp.arange(ql, dtype=jnp.int32)[None, :]
    tq_rev = jnp.take_along_axis(
        tcodes, jnp.clip(start[:, None] + jj, 0, wt - 1), axis=1)
    tq = jnp.flip(tq_rev, axis=1)
    ti = A[:, None] - qs
    ti_ok = (ti >= 0) & (ti < wt)
    tq = jnp.where(ti_ok, tq, 5)              # sentinel: never WC/comp

    qarr = jnp.asarray(q)[None, :]
    comp = wc5(qarr, tq) & ti_ok              # == is_comp_base here

    # ---- frayed-end trim ------------------------------------------------
    in_path = (qs >= qi0[:, None]) & (qs <= qi1[:, None])
    wcp = comp & in_path
    any_wc = jnp.any(wcp, axis=1)
    lo = jnp.argmax(wcp, axis=1).astype(jnp.int32)
    hi = (ql - 1 - jnp.argmax(wcp[:, ::-1], axis=1)).astype(jnp.int32)
    align_len = jnp.where(any_wc, hi - lo + 1, 0)

    # ---- evaluation scan (ordered f32) ----------------------------------
    tprev = jnp.concatenate(
        [jnp.full((Bs, 1), 5, jnp.int32), tq[:, :-1]], axis=1)
    # tprev row qi holds t[A-(qi-1)] = the PREVIOUS alignment position's
    # target base (alignment order ascends qi)
    tpair = jnp.clip(tprev, 0, 4) * 5 + jnp.clip(tq, 0, 4)

    trimmed = (qs >= lo[:, None]) & (qs <= hi[:, None])
    wct = comp & trimmed
    lastwc = jax.lax.cummax(jnp.where(wct, qs, -1), axis=1)

    f0 = jnp.float32(0.0)
    T_all = jnp.stack(
        [jnp.asarray(tabs["Hstk"]), jnp.asarray(tabs["Sstk"]),
         jnp.asarray(tabs["Hlt"]), jnp.asarray(tabs["Slt"])],
        axis=2)                               # (ql, 25, 4)
    loop2m = jnp.asarray(tabs["loop2m"])

    prev_wct = jnp.concatenate(
        [jnp.zeros((Bs, 1), bool), wct[:, :-1]], axis=1)
    # in_loop per reference: current non-WC AND previous non-WC
    in_loop = (~comp) & jnp.concatenate(
        [jnp.ones((Bs, 1), bool), ~comp[:, :-1]], axis=1)
    is_stack = trimmed & (qs > lo[:, None]) & ~in_loop
    mm_run = jnp.where(wct, qs - 1 - jnp.roll(lastwc, 1, axis=1), 0)
    mm_run = jnp.where(qs > lo[:, None], mm_run, 0)
    closing = wct & (mm_run >= 2)
    first_mm = trimmed & (qs > lo[:, None]) & (~comp) & prev_wct
    loopS = jnp.sum(
        jnp.where(mm_run[:, :, None]
                  == jnp.arange(ql + 1)[None, None, :],
                  loop2m[None, None, :], f0), axis=2)

    # AT closings at the trimmed terminals (both WC pairs)
    q_at = jnp.asarray(q)
    qlo = q_at[jnp.clip(lo, 0, ql - 1)]
    tlo = jnp.take_along_axis(tq, lo[:, None], axis=1)[:, 0]
    at5 = ((qlo == 0) & (tlo == 3)) | ((qlo == 3) & (tlo == 0))
    qhi = q_at[jnp.clip(hi, 0, ql - 1)]
    thi = jnp.take_along_axis(tq, hi[:, None], axis=1)[:, 0]
    at3 = ((qhi == 0) & (thi == 3)) | ((qhi == 3) & (thi == 0))

    AT_H = jnp.float32(tabs["AT_H"])
    AT_S = jnp.float32(tabs["AT_S"])
    dH0 = jnp.full(Bs, tabs["init_H"], jnp.float32)
    dS0 = jnp.full(Bs, tabs["init_S"], jnp.float32)
    dH0 = dH0 + jnp.where(at5 & any_wc, AT_H, f0)
    dS0 = dS0 + jnp.where(at5 & any_wc, AT_S, f0)

    hi_p = jax.lax.Precision.HIGHEST

    def qstep(carry, xs):
        dH, dS, sv_h, sv_s, sv_lth, sv_lts = carry
        tp, is_stk, is_close, is_first, loop_s, T_row = xs
        oh = (tp[:, None] == jnp.arange(25)[None, :]).astype(jnp.float32)
        vals = jnp.dot(oh, T_row, precision=hi_p)      # (Bs, 4)
        stk_h, stk_s, lt_h, lt_s = (vals[:, 0], vals[:, 1],
                                    vals[:, 2], vals[:, 3])
        sv_h = jnp.where(is_first, stk_h, sv_h)
        sv_s = jnp.where(is_first, stk_s, sv_s)
        sv_lth = jnp.where(is_first, lt_h, sv_lth)
        sv_lts = jnp.where(is_first, lt_s, sv_lts)
        dH = dH + jnp.where(is_stk, stk_h, f0)
        dS = dS + jnp.where(is_stk, stk_s, f0)
        dS = dS + jnp.where(is_close, loop_s, f0)
        dH = dH - jnp.where(is_close, stk_h, f0)
        dS = dS - jnp.where(is_close, stk_s, f0)
        dH = dH + jnp.where(is_close, lt_h, f0)
        dS = dS + jnp.where(is_close, lt_s, f0)
        dH = dH - jnp.where(is_close, sv_h, f0)
        dS = dS - jnp.where(is_close, sv_s, f0)
        dH = dH + jnp.where(is_close, sv_lth, f0)
        dS = dS + jnp.where(is_close, sv_lts, f0)
        return (dH, dS, sv_h, sv_s, sv_lth, sv_lts), None

    xs = (jnp.moveaxis(tpair, 1, 0),
          jnp.moveaxis(is_stack, 1, 0),
          jnp.moveaxis(closing, 1, 0),
          jnp.moveaxis(first_mm, 1, 0),
          jnp.moveaxis(loopS, 1, 0),
          T_all)
    z = jnp.zeros(Bs, jnp.float32)
    (dH, dS, _, _, _, _), _ = jax.lax.scan(
        qstep, (dH0, dS0, z, z, z, z), xs)
    dH = dH + jnp.where(at3 & any_wc, AT_H, f0)
    dS = dS + jnp.where(at3 & any_wc, AT_S, f0)

    num_base = (2 + 2 * jnp.sum(is_stack, axis=1)
                + 2 * jnp.sum(closing, axis=1)).astype(jnp.int32)
    mm = jnp.sum(trimmed & ~comp, axis=1).astype(jnp.int32)

    fm_q = lo
    fm_t = A - lo
    lm_q = hi
    lm_t = A - hi

    # ---- anchors (reference nuc_cruc_anchor.cpp:143-345) ----------------
    # anchor5 walks (q[k], t[A-k]) from k=0: the same diagonal -> comp
    anchor5 = jnp.sum(jnp.cumprod(comp.astype(jnp.int32), axis=1),
                      axis=1).astype(jnp.int32)
    t5_ok = (A >= 0) & (A < wt)
    anchor5 = jnp.where(t5_ok, anchor5, 0)
    # anchor3 walks from k = ql-1 down: cumprod of reversed comp
    anchor3 = jnp.sum(jnp.cumprod(comp[:, ::-1].astype(jnp.int32),
                                  axis=1), axis=1).astype(jnp.int32)
    t3_start = (lm_q + lm_t + 1) - ql        # == A + 1 - ql
    t3_ok = (t3_start >= 0) & (t3_start < wt)
    anchor3 = jnp.where(t3_ok, anchor3, 0)

    usable = (align_len >= 3) & (dH < 0)
    return {
        "trusted": trusted,
        "tm_zero": no_align | (trusted & ~usable),
        "dH": dH, "dS": dS, "num_base": num_base,
        "mm": mm, "align_len": align_len,
        "fm_q": fm_q, "fm_t": fm_t, "lm_q": lm_q, "lm_t": lm_t,
        "anchor5": anchor5, "anchor3": anchor3,
    }


def eval_flat(M_rows, mg_max, tcodes, q, ql, wt_s, oh_s, ev_tabs,
              ev_loop2m, eval_const):
    """Flat-pool variant of eval_segment: one call for a mixed-slot
    candidate chunk, per-entry oligo length/strand as data.

    M_rows: (wq_max, B, wt_max+1) int32 full-DP M rows at the ENGINE
        temperature; rows >= ql[b] and columns > wt_s[b] contain junk
        from the padded scan and are masked here (junk never flows into
        valid cells: the DP reads only left/up neighbours, and padding
        sits after the real extent on both axes).
    mg_max:  (B,) int32 gapped-best channel max
    tcodes:  (B, wt_max) int32 oriented window codes in {0..5}
    q:       (B, wq_max) int32 per-entry query codes (0 beyond ql)
    ql:      (B,) int32 per-entry oligo length
    wt_s:    (B,) int32 per-entry window width (ql + 2*flank)
    oh_s:    (B, num_os) f32 exact one-hot of the entry's slot
    ev_tabs: (num_os, wq_max, 25, 4) f32 per-slot stack/loop-term tables
    ev_loop2m: (num_os, wq_max + 2) f32 per-slot loop entropies
    eval_const: (AT_H, AT_S, init_H, init_S) floats

    Bit-exactness: every per-slot table row is selected through an exact
    one-hot f32 matmul (single nonzero coefficient, HIGHEST precision),
    and the accumulation scan runs wq_max steps whose padded tail adds
    +0.0f (a no-op on f32 values; the reference order of the real adds
    is unchanged).  Agreement with eval_segment is asserted by
    tests/test_eval_gapless_jax.py::test_eval_flat_matches_segment.
    """
    wq_max, B, wtp1 = M_rows.shape
    wt_max = wtp1 - 1
    hi_p = jax.lax.Precision.HIGHEST
    f0 = jnp.float32(0.0)
    qs = jnp.arange(wq_max, dtype=jnp.int32)[None, :]
    jcol = jnp.arange(wtp1, dtype=jnp.int32)[None, None, :]
    rr = jnp.arange(wq_max, dtype=jnp.int32)[:, None, None]

    # mask padded rows/columns (column 0 is the -1 boundary, kept)
    M_rows = jnp.where((rr < ql[None, :, None])
                       & (jcol <= wt_s[None, :, None]), M_rows, -1)

    # ---- best cell + uniqueness ----------------------------------------
    flatM = jnp.moveaxis(M_rows, 1, 0).reshape(B, wq_max * wtp1)
    best = jnp.max(flatM, axis=1)
    n_best = jnp.sum(flatM == best[:, None], axis=1)
    amax = jnp.argmax(flatM, axis=1).astype(jnp.int32)
    r_star = amax // wtp1
    j_star = amax % wtp1
    i_star = r_star + 1
    no_align = best < 0
    unique = (n_best == 1) & ~no_align
    no_gap_tie = mg_max < best

    qi0 = ql - i_star
    A = qi0 + (j_star - 1)

    # ---- M values along the path diagonal, in qi-space ------------------
    # DP row r holds qi = ql - 1 - r at column j = A - ql + r + 2
    Mr_cols = []
    for r in range(wq_max):
        j_r = A - ql + r + 2
        ok = (j_r >= 0) & (j_r < wtp1) & (r < ql)
        v = jnp.take_along_axis(
            M_rows[r], jnp.clip(j_r, 0, wt_max)[:, None], axis=1)[:, 0]
        Mr_cols.append(jnp.where(ok, v, -1))
    Mbyr = jnp.stack(Mr_cols, axis=1)            # (B, wq_max) by DP row
    # qi = ql - 1 - r  ->  gather row index r = ql - 1 - qi
    Mdiag = jnp.take_along_axis(
        Mbyr, jnp.clip(ql[:, None] - 1 - qs, 0, wq_max - 1), axis=1)
    Mdiag = jnp.where(qs < ql[:, None], Mdiag, -1)

    in_walk = (qs >= qi0[:, None]) & (qs <= jnp.minimum(
        ql - 1, A)[:, None])
    neg_here = in_walk & (Mdiag < 0)
    qi_neg = jnp.min(jnp.where(neg_here, qs, wq_max), axis=1)
    has_neg = qi_neg < wq_max
    walk_hi = jnp.minimum(ql - 1, A)
    qi1 = jnp.where(has_neg, qi_neg, walk_hi)
    row0_stale = (~has_neg) & (A > ql - 1)
    visited = (qs >= qi0[:, None]) & (qs <= qi1[:, None])
    no_zero = jnp.all(jnp.where(visited & (Mdiag >= 0), Mdiag != 0, True),
                      axis=1)

    trusted = no_align | (unique & no_gap_tie & ~row0_stale & no_zero)

    # ---- window codes along the diagonal: tq[qi] = t[A - qi] ------------
    ti = A[:, None] - qs
    ti_ok = (ti >= 0) & (ti < wt_s[:, None]) & (qs < ql[:, None])
    tq = jnp.take_along_axis(
        tcodes, jnp.clip(ti, 0, wt_max - 1), axis=1)
    tq = jnp.where(ti_ok, tq, 5)                 # sentinel: never WC/comp

    comp = wc5(q, tq) & ti_ok

    # ---- frayed-end trim ------------------------------------------------
    in_path = (qs >= qi0[:, None]) & (qs <= qi1[:, None])
    wcp = comp & in_path
    any_wc = jnp.any(wcp, axis=1)
    lo = jnp.argmax(wcp, axis=1).astype(jnp.int32)
    hi = (wq_max - 1 - jnp.argmax(wcp[:, ::-1], axis=1)).astype(jnp.int32)
    # no-WC garbage value parity with eval_segment (hi = ql - 1 there)
    hi = jnp.where(any_wc, hi, ql - 1)
    align_len = jnp.where(any_wc, hi - lo + 1, 0)

    # ---- evaluation scan (ordered f32) ----------------------------------
    tprev = jnp.concatenate(
        [jnp.full((B, 1), 5, jnp.int32), tq[:, :-1]], axis=1)
    tpair = jnp.clip(tprev, 0, 4) * 5 + jnp.clip(tq, 0, 4)

    trimmed = (qs >= lo[:, None]) & (qs <= hi[:, None])
    wct = comp & trimmed
    lastwc = jax.lax.cummax(jnp.where(wct, qs, -1), axis=1)

    loop2m_eff = jnp.dot(oh_s, ev_loop2m, precision=hi_p)  # (B, wq_max+2)

    prev_wct = jnp.concatenate(
        [jnp.zeros((B, 1), bool), wct[:, :-1]], axis=1)
    in_loop = (~comp) & jnp.concatenate(
        [jnp.ones((B, 1), bool), ~comp[:, :-1]], axis=1)
    is_stack = trimmed & (qs > lo[:, None]) & ~in_loop
    mm_run = jnp.where(wct, qs - 1 - jnp.roll(lastwc, 1, axis=1), 0)
    mm_run = jnp.where(qs > lo[:, None], mm_run, 0)
    closing = wct & (mm_run >= 2)
    first_mm = trimmed & (qs > lo[:, None]) & (~comp) & prev_wct
    loopS = jnp.zeros((B, wq_max), jnp.float32)
    for m in range(wq_max + 1):
        loopS = loopS + jnp.where(mm_run == m, loop2m_eff[:, m:m + 1], f0)

    # AT closings at the trimmed terminals (both WC pairs)
    qlo = jnp.take_along_axis(q, jnp.clip(lo, 0, wq_max - 1)[:, None],
                              axis=1)[:, 0]
    tlo = jnp.take_along_axis(tq, lo[:, None], axis=1)[:, 0]
    at5 = ((qlo == 0) & (tlo == 3)) | ((qlo == 3) & (tlo == 0))
    qhi = jnp.take_along_axis(q, jnp.clip(hi, 0, wq_max - 1)[:, None],
                              axis=1)[:, 0]
    thi = jnp.take_along_axis(tq, hi[:, None], axis=1)[:, 0]
    at3 = ((qhi == 0) & (thi == 3)) | ((qhi == 3) & (thi == 0))

    AT_H = jnp.float32(eval_const[0])
    AT_S = jnp.float32(eval_const[1])
    dH0 = jnp.full(B, eval_const[2], jnp.float32)
    dS0 = jnp.full(B, eval_const[3], jnp.float32)
    dH0 = dH0 + jnp.where(at5 & any_wc, AT_H, f0)
    dS0 = dS0 + jnp.where(at5 & any_wc, AT_S, f0)

    def qstep(carry, xs):
        dH, dS, sv_h, sv_s, sv_lth, sv_lts = carry
        tp, is_stk, is_close, is_first, loop_s, T_row = xs
        # T_row: (num_os, 25, 4) -> per-entry via exact one-hot mix
        T_eff = jnp.einsum('bs,spk->bpk', oh_s, T_row,
                           precision=hi_p)
        oh = (tp[:, None] == jnp.arange(25)[None, :]).astype(jnp.float32)
        vals = jnp.einsum('bp,bpk->bk', oh, T_eff, precision=hi_p)
        stk_h, stk_s, lt_h, lt_s = (vals[:, 0], vals[:, 1],
                                    vals[:, 2], vals[:, 3])
        sv_h = jnp.where(is_first, stk_h, sv_h)
        sv_s = jnp.where(is_first, stk_s, sv_s)
        sv_lth = jnp.where(is_first, lt_h, sv_lth)
        sv_lts = jnp.where(is_first, lt_s, sv_lts)
        dH = dH + jnp.where(is_stk, stk_h, f0)
        dS = dS + jnp.where(is_stk, stk_s, f0)
        dS = dS + jnp.where(is_close, loop_s, f0)
        dH = dH - jnp.where(is_close, stk_h, f0)
        dS = dS - jnp.where(is_close, stk_s, f0)
        dH = dH + jnp.where(is_close, lt_h, f0)
        dS = dS + jnp.where(is_close, lt_s, f0)
        dH = dH - jnp.where(is_close, sv_h, f0)
        dS = dS - jnp.where(is_close, sv_s, f0)
        dH = dH + jnp.where(is_close, sv_lth, f0)
        dS = dS + jnp.where(is_close, sv_lts, f0)
        return (dH, dS, sv_h, sv_s, sv_lth, sv_lts), None

    xs = (jnp.moveaxis(tpair, 1, 0),
          jnp.moveaxis(is_stack, 1, 0),
          jnp.moveaxis(closing, 1, 0),
          jnp.moveaxis(first_mm, 1, 0),
          jnp.moveaxis(loopS, 1, 0),
          jnp.moveaxis(ev_tabs, 1, 0))
    z = jnp.zeros(B, jnp.float32)
    (dH, dS, _, _, _, _), _ = jax.lax.scan(
        qstep, (dH0, dS0, z, z, z, z), xs)
    dH = dH + jnp.where(at3 & any_wc, AT_H, f0)
    dS = dS + jnp.where(at3 & any_wc, AT_S, f0)

    num_base = (2 + 2 * jnp.sum(is_stack, axis=1)
                + 2 * jnp.sum(closing, axis=1)).astype(jnp.int32)
    mm = jnp.sum(trimmed & ~comp, axis=1).astype(jnp.int32)

    fm_q = lo
    fm_t = A - lo
    lm_q = hi
    lm_t = A - hi

    # ---- anchors (reference nuc_cruc_anchor.cpp:143-345) ----------------
    anchor5 = jnp.sum(jnp.cumprod(comp.astype(jnp.int32), axis=1),
                      axis=1).astype(jnp.int32)
    t5_ok = (A >= 0) & (A < wt_s)
    anchor5 = jnp.where(t5_ok, anchor5, 0)
    comp_rev = jnp.take_along_axis(
        comp, jnp.clip(ql[:, None] - 1 - qs, 0, wq_max - 1), axis=1) \
        & (qs < ql[:, None])
    anchor3 = jnp.sum(jnp.cumprod(comp_rev.astype(jnp.int32), axis=1),
                      axis=1).astype(jnp.int32)
    t3_start = (lm_q + lm_t + 1) - ql
    t3_ok = (t3_start >= 0) & (t3_start < wt_s)
    anchor3 = jnp.where(t3_ok, anchor3, 0)

    usable = (align_len >= 3) & (dH < 0)
    return {
        "trusted": trusted,
        "tm_zero": no_align | (trusted & ~usable),
        "dH": dH, "dS": dS, "num_base": num_base,
        "mm": mm, "align_len": align_len,
        "fm_q": fm_q, "fm_t": fm_t, "lm_q": lm_q, "lm_t": lm_t,
        "anchor5": anchor5, "anchor3": anchor3,
    }
