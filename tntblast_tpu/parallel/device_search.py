"""Full-fragment device search step — the TPU-native inner loop.

One device program per fragment batch performs, for ALL oligos of the
assay panel at once:

  1. k-mer word computation over each fragment (2-bit rolling words,
     non-ATGC bases break words — reference seq_hash.h:441-445 semantics),
  2. seed-diagonal detection for every (oligo, strand): diagonal p carries
     a seed iff some compacted oligo word k matches the target word at
     p + k; the representative hit is the smallest such k (the reference's
     first-occurrence-per-diagonal dedup, bind_oligo.cpp:33-47),
  3. two-stage fixed-capacity compaction of seed diagonals (any-slot
     positions first, then (position, slot) pairs — the dense bitmap is
     only scanned once at fragment length, not once per slot),
  4. POOLING of all fragments' candidates into one stream, stable-sorted
     by slot so the screening DP runs one fixed-shape call per slot with
     the slot's oligo length, strand and per-row energy tables folded in
     as compile-time constants — the energy materialization is a single
     constant-operand one-hot MXU matmul per slot (bit-exact integers, no
     gathers; measured ~170x faster than the per-window gather form),
  5. candidate window gather (start = p-4, width oligo_len+8, minus-strand
     windows complemented and reversed — bind_oligo.cpp:136-254; windows
     clipped by a fragment edge or containing any non-{A,C,G,T,I} base are
     routed to the host),
  6. the exact-integer thermodynamic DP (ops/thermo_dp.dp_scores_canon)
     at each screening temperature, producing a conservative keep/discard
     verdict per window (see screen.py for the proof).

The host then runs the exact native engine only on kept windows; all
list-building, culling and pairing semantics stay host-side and
bit-identical.  The resolve payload is a single packed int32 buffer
(header + kept-seed rows): one device-to-host transfer per batch.

Multi-chip: the fragment axis is the data-parallel axis (the reference's
"database segmentation", tntblast_local.cpp:318-324); oligos and tables
are replicated.  parallel/mesh.py wraps this step in shard_map over a jax
Mesh.
"""

import functools

import numpy as np

from tntblast_tpu.jaxconf import configure as _jaxconf
_jaxconf()

import jax
import jax.numpy as jnp

from tntblast_tpu import constants as C
from tntblast_tpu.ops.eval_gapless_jax import eval_segment
from tntblast_tpu.ops.thermo_dp import (
    NUM_T5, _relu, build_qpair_rows, build_t_canon)

NEG_I32 = -(1 << 29)

INT_MIN = -(1 << 31) + 1


class PanelConfig:
    """Static (compile-time) shape configuration for a run."""

    # windows per DP launch: bounds the per-chunk window tensors
    DP_CHUNK = 4096

    def __init__(self, word_len, num_os, max_words, wq_max, tile_len,
                 cap, num_cond, kcap=None):
        self.word_len = int(word_len)
        self.num_os = int(num_os)          # oligo-strand slots (padded)
        self.max_words = int(max_words)    # compacted word-list capacity
        self.wq_max = int(wq_max)
        self.wt = int(wq_max) + 2 * C.NUM_FLANK_BASE
        self.tile_len = int(tile_len)      # fragment buffer length (padded)
        cap = int(cap)
        if cap > self.DP_CHUNK:            # chunked DP needs even division
            cap = -(-cap // self.DP_CHUNK) * self.DP_CHUNK
        self.cap = cap                     # candidate capacity per fragment
        # per-fragment capacity of the device-compacted KEPT-seed list —
        # the only per-candidate payload the resolve reads back (scaled by
        # the batch size and pooled, so a fragment can exceed its share as
        # long as the batch total fits).  The SOUND screen keeps ~60-70%
        # of candidates on random background (docs/screen_bound.md);
        # callers with screening disabled pass kcap=cap.
        self.kcap = int(kcap) if kcap is not None else max(
            (3 * cap) // 4, 512)
        self.kcap = min(self.kcap, cap)
        self.num_cond = int(num_cond)

    def batch_kcap(self, n_frags):
        if self.kcap:
            return min(self.kcap * n_frags, n_frags * self.cap)
        return n_frags * self.cap

    def key(self):
        return (self.word_len, self.num_os, self.max_words, self.wq_max,
                self.tile_len, self.cap, self.num_cond, self.kcap)


def _seed_fragment(frag_codes, frag_len, oligo_words, w_table, *,
                   word_len, num_os, max_words, tile_len, cap):
    """Seeding + two-stage compaction for ONE fragment.

    w_table: (4^word_len, num_os) int32 word-value -> per-slot k-bitmask
      lookup (bit k set iff oligo word k equals the value), or a (1,
      num_os) dummy when the table is gated off (see DevicePanel) — the
      static shape selects the path at trace time.  The table path
      replaces the dense (positions x slots x words) compare loop with
      one 1-D any-match gather plus compaction-then-scatter over the
      actual matches (~50x less element traffic on the bench panel).

    Returns (slot, p, n_cand, counts, overflow, word, word_valid):
      slot/p: (cap,) int32 compacted (diagonal-ascending, slot-minor)
      n_cand: () int32 true candidate count
      counts: (num_os,) int32 per-slot seed-diagonal counts
      word/word_valid: (nw_pos,) target word arrays (kmin recompute)
    """
    w = word_len
    L = tile_len
    nw_pos = L - w + 1
    codes = frag_codes.astype(jnp.int32)

    # --- target words -----------------------------------------------------
    two_bit = codes & 3
    valid_base = (codes <= C.DB_MAX_ATGC) & (jnp.arange(L) < frag_len)
    word = jnp.zeros(nw_pos, dtype=jnp.int32)
    for k in range(w):
        word = word | (two_bit[k:nw_pos + k] << (2 * (w - 1 - k)))
    vc = jnp.cumsum(jnp.concatenate(
        [jnp.zeros(1, jnp.int32), valid_base.astype(jnp.int32)]))
    word_valid = (vc[w:] - vc[:-w]) == w
    word_valid = word_valid & (jnp.arange(nw_pos) < (frag_len - w + 1))

    # --- seed diagonals ---------------------------------------------------
    # diagonal index space: p in [-(max_words-1), L) -> idx = p + max_words
    PL = L + max_words
    over_t = jnp.asarray(False)
    if w_table.shape[0] > 1:
        # any-match per position (1-D gather; a_any is unbatched under
        # the fragment vmap, computed once per call)
        a_any = (w_table != 0).any(axis=1)
        any_m = a_any[word] & word_valid
        (widx,) = jnp.nonzero(any_m, size=cap, fill_value=nw_pos)
        w_ok = widx < nw_pos
        wsel = jnp.clip(widx, 0, nw_pos - 1)
        masks = jnp.where(w_ok[:, None], w_table[word[wsel]], 0)
        # (position, slot) pairs with >= 1 word match
        (pidx,) = jnp.nonzero((masks != 0).reshape(-1), size=cap,
                              fill_value=cap * num_os)
        p_ok = pidx < cap * num_os
        pc = jnp.clip(pidx, 0, cap * num_os - 1)
        ppos = wsel[pc // num_os]
        po = pc % num_os
        pmask = jnp.where(p_ok, masks.reshape(-1)[pc], 0)
        kk = jnp.arange(max_words, dtype=jnp.int32)
        kbit = ((pmask[:, None] >> kk[None, :]) & 1) > 0    # (cap, mw)
        didx = ppos[:, None] + (max_words - kk)[None, :]
        flat = jnp.where(kbit, didx * num_os + po[:, None],
                         PL * num_os)
        # compact the (position, slot, k) triples before scattering —
        # scatter work drops from cap*max_words to cap updates
        (tidx,) = jnp.nonzero(kbit.reshape(-1), size=cap,
                              fill_value=cap * max_words)
        t_ok = tidx < cap * max_words
        tflat = jnp.where(
            t_ok, flat.reshape(-1)[jnp.clip(tidx, 0,
                                            cap * max_words - 1)],
            PL * num_os)
        seeds = jnp.zeros(PL * num_os, dtype=bool).at[
            tflat].set(True, mode="drop").reshape(PL, num_os)
        over_t = ((any_m.sum() > cap) | ((masks != 0).sum() > cap)
                  | (kbit.sum() > cap))
    else:
        seeds = jnp.zeros((PL, num_os), dtype=bool)
        for k in range(max_words):
            ow = oligo_words[:, k]                   # (num_os,)
            active = (ow >= 0)
            m = word_valid[:, None] & (word[:, None] == ow[None, :]) \
                & active[None, :]                    # (nw_pos, num_os)
            off = max_words - k
            seeds = seeds.at[off:off + nw_pos].set(
                seeds[off:off + nw_pos] | m)

    counts = seeds.sum(axis=0).astype(jnp.int32)

    # --- two-stage compaction --------------------------------------------
    any_pos = seeds.any(axis=1)                      # (PL,)
    n_pos = any_pos.sum()
    (pos_idx,) = jnp.nonzero(any_pos, size=cap, fill_value=PL)
    pos_ok = pos_idx < PL
    sub = seeds[jnp.clip(pos_idx, 0, PL - 1)] & pos_ok[:, None]
    (cidx,) = jnp.nonzero(sub.reshape(-1), size=cap,
                          fill_value=cap * num_os)
    cvalid = cidx < cap * num_os
    pos_rank = jnp.where(cvalid, cidx // num_os, 0)
    slot = jnp.where(cvalid, cidx % num_os, 0).astype(jnp.int32)
    p = (pos_idx[jnp.clip(pos_rank, 0, cap - 1)] - max_words).astype(
        jnp.int32)
    p = jnp.where(cvalid, p, 0)
    n_cand = sub.sum().astype(jnp.int32)
    overflow = over_t | (n_pos > cap) | (counts.sum() > cap)
    return slot, p, n_cand, counts, overflow, word, word_valid




def _slot_segment_caps(slot_meta, n_frags, tile_len, word_len):
    """Static per-slot segment capacities: ~2x the expected seed-diagonal
    count of the batch on random sequence, padded for variance."""
    caps = []
    for meta_s in slot_meta:
        n_words = meta_s[3]
        expected = n_frags * tile_len * max(n_words, 1) >> (2 * word_len)
        caps.append(-(-(2 * expected + 512) // 256) * 256)
    return tuple(caps)


def panel_step_core(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c,
                    input_over, oligo_words, w_table, t_canon, thresholds,
                    t_canon_eval, eval_tabs, eval_loop2m,
                    *, slot_meta, eval_const, word_len, num_os, max_words,
                    wq_max, tile_len, cap, kcap, num_cond, n_frags,
                    eval_on=False, full=False):
    """Device program: seeds + per-slot screening DP for a fragment batch.

    frags:       (n_frags, tile_len) uint8 db codes, padded DB_UNKNOWN
    frag_lens:   (n_frags,) int32 true lengths
    oligo_words: (num_os, max_words) int32 compacted word values (-1 pad)
    t_canon:     (num_cond, 30, 30, 7) int32 canonical DP energy tables
                 (ops/thermo_dp.build_t_canon)
    thresholds:  (num_cond, num_os) int32 min DP score (INT_MIN = off)
    slot_meta:   STATIC tuple, one (oligo_len, minus, qpair_rows_tuple,
                 n_words) per real slot — folded into the compiled program
                 so every slot's DP runs at its exact oligo length with
                 constant energy-table operands (MXU one-hot matmul, no
                 gathers).

    The candidate pool (all fragments x per-fragment compaction) is
    stable-sorted by slot; each slot's segment is processed by one DP call
    whose batch is the slot's static capacity (_slot_segment_caps).  An
    inactive slot (no candidates) skips its DP via lax.cond.

    Returns (header, kept_block, slot, p, keep, needs_host, valid):
      header: 1-D int32 —
        [0]                      n_kept (total over the batch)
        [1 : 1+n]                per-fragment overflow flags
        [1+n : 1+n+num_os]       per-slot segment-overflow flags
        [... : ... + n]          per-fragment candidate counts
        [... : ... + n*num_os]   per-(fragment, slot) seed counts
      kept_block: (9, bkcap) int32 kept rows — flat_idx, slot, p, kmin,
        eval w0..w4 (packed flags/counts/ranges and the f32 bit patterns
        of dH/dS from the device gapless evaluator; zeros when
        eval_on=False).  The resolve reads the tiny header first, then
        only the used prefix of this block (two transfers instead of a
        worst-case-sized one).
      slot/p/valid: (n_frags, cap) per-candidate arrays.
      keep/needs_host: pool-order per-candidate arrays when full=True
      (tests), all-zeros placeholders otherwise.
    """
    n = n_frags
    L = tile_len
    nw_pos = L - word_len + 1
    bkcap = min(kcap * n, n * cap) if kcap else n * cap
    n_real = len(slot_meta)
    seg_caps = _slot_segment_caps(slot_meta, n, tile_len, word_len)
    max_seg = max(seg_caps)

    # --- reconstruct fragment codes from the packed payload --------------
    # 2-bit base stream + synthesized padding + N-run mask + scattered
    # exceptions (see DevicePanel._pack_host)
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    frags = ((frags_packed[:, :, None] >> shifts[None, None, :]) & 3
             ).reshape(n, L).astype(jnp.uint8)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    frags = jnp.where(pos >= frag_lens[:, None],
                      jnp.uint8(C.DB_UNKNOWN), frags)
    # N runs: +1 at starts, -1 at ends, prefix-sum > 0
    delta = jnp.zeros((n, L + 1), jnp.int32)
    ones = jnp.ones(nrun_s.shape, jnp.int32)
    delta = delta.at[jnp.arange(n)[:, None],
                     jnp.clip(nrun_s, 0, L)].add(ones)
    delta = delta.at[jnp.arange(n)[:, None],
                     jnp.clip(nrun_e, 0, L)].add(-ones)
    in_n = jnp.cumsum(delta[:, :L], axis=1) > 0
    frags = jnp.where(in_n, jnp.uint8(C.DB_N), frags)
    # scattered exceptions (pad rows point at column L: dropped)
    frags = jnp.concatenate(
        [frags, jnp.zeros((n, 1), jnp.uint8)], axis=1)
    frags = frags.at[jnp.arange(n)[:, None],
                     jnp.clip(exc_p, 0, L)].set(exc_c)
    frags = frags[:, :L]

    seed = functools.partial(
        _seed_fragment, word_len=word_len, num_os=num_os,
        max_words=max_words, tile_len=tile_len, cap=cap)
    (slot, p, n_cand, counts, overflow, word,
     word_valid) = jax.vmap(seed, in_axes=(0, 0, None, None))(
        frags, frag_lens, oligo_words, w_table)
    overflow = overflow | input_over

    # --- pooled candidate stream, slot-major via stable sort -------------
    Bp = n * cap
    slot_f = slot.reshape(Bp)
    p_f = p.reshape(Bp)
    rank = jnp.arange(Bp, dtype=jnp.int32) % cap
    frag_f = jnp.arange(Bp, dtype=jnp.int32) // cap
    # Number of COMPACTED entries per fragment: the per-fragment nonzero
    # truncates at cap, while n_cand is the TRUE candidate count (the
    # dense seeding path can exceed cap; such fragments are flagged
    # overflow and host-searched).  valid must describe the compacted
    # arrays, not the true counts, or fill rows would enter the pool.
    n_comp = jnp.minimum(n_cand, cap)
    valid = rank < n_comp[frag_f]

    key = jnp.where(valid, slot_f, num_os)
    order = jnp.argsort(key, stable=True)            # slot-major; within a
    p_sorted = p_f[order]                            # slot: frag-major,
    frag_sorted = frag_f[order]                      # p-ascending
    # pad so dynamic_slice never clamps into a previous slot's tail
    pad = jnp.zeros(max_seg, dtype=jnp.int32)
    p_sorted = jnp.concatenate([p_sorted, pad])
    frag_sorted = jnp.concatenate([frag_sorted, pad])
    order_pad = jnp.concatenate([order.astype(jnp.int32), pad])

    # Segment boundaries MUST be derived from the pooled compacted stream
    # (exactly what the sorted arrays contain), never from the true seed
    # counts: one fragment overflowing cap would otherwise shift every
    # later slot's dynamic_slice and corrupt clean batchmates' kept-seed
    # lists (the round-4 soundness bug).
    slot_counts = jnp.bincount(
        key, length=num_os + 1)[:num_os].astype(jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(slot_counts)])
    slot_over = slot_counts[:n_real] > jnp.asarray(seg_caps, jnp.int32)

    frags_flat = frags.reshape(-1)

    nc_all = num_cond + (1 if eval_on else 0)
    tc_all = (jnp.concatenate([t_canon, t_canon_eval[None]], axis=0)
              if eval_on else t_canon)

    # --- per-slot screening DP, vmapped over oligo-length groups ---------
    # The step is loop-dispatch-bound on TPU, not compute-bound
    # (BASELINE.md round-4 decomposition): one sequential lax.scan per
    # slot serializes ~n_real * wq tiny loop bodies.  Slots with the
    # same oligo length share every shape, so `minus` becomes per-slot
    # data and the whole slot (scan, filters, eval channel) runs under
    # one vmap per distinct length — a handful of scans regardless of
    # panel size.
    groups = {}
    for s, meta_s in enumerate(slot_meta):
        groups.setdefault(meta_s[0], []).append(s)

    keep_segs = [None] * n_real
    nh_segs = [None] * n_real
    segpos_segs = [None] * n_real
    ev_segs = [None] * n_real
    for ol, g_slots in sorted(groups.items()):
        Gs = len(g_slots)
        wq_s = ol
        wt_s = ol + 2 * C.NUM_FLANK_BASE
        Bs = max(seg_caps[s] for s in g_slots)    # group DP capacity
        sl = np.asarray(g_slots, dtype=np.int32)
        cap_g = jnp.asarray([seg_caps[s] for s in g_slots], jnp.int32)
        cnt_g = jnp.minimum(slot_counts[sl], cap_g)
        minus_g = jnp.asarray([slot_meta[s][1] for s in g_slots])
        pp_g = jnp.stack([jax.lax.dynamic_slice(
            p_sorted, (seg_start[s],), (Bs,)) for s in g_slots])
        fi_g = jnp.stack([jax.lax.dynamic_slice(
            frag_sorted, (seg_start[s],), (Bs,)) for s in g_slots])
        seg_valid_g = jnp.arange(Bs)[None, :] < cnt_g[:, None]

        # per-slot, per-ROW energy operand T[r, v, (c, e)]: the scan
        # consumes one row slice per iteration and the (tiny) row matmul
        # happens inside the loop body — materializing the full
        # (Gs, Bs, wt, wq, nc, 7) energy tensor as scan xs would cost
        # gigabytes of HBM on a large panel
        qp_g = np.asarray([slot_meta[s][2] for s in g_slots], np.int32)
        Ts_g = tc_all[:, :, jnp.asarray(qp_g), :]    # (nc',30,Gs,wq,7)
        Ts_g = jnp.transpose(Ts_g, (2, 3, 1, 0, 4)).reshape(
            Gs, wq_s, 30, nc_all * 7).astype(jnp.float32)
        thr_g = thresholds[:, sl].T                  # (Gs, nc)
        if eval_on:
            tabs_g = {
                "Hstk": eval_tabs[sl, :ol, :, 0],
                "Sstk": eval_tabs[sl, :ol, :, 1],
                "Hlt": eval_tabs[sl, :ol, :, 2],
                "Slt": eval_tabs[sl, :ol, :, 3],
                "loop2m": eval_loop2m[sl, :ol + 1],
                "AT_H": eval_const[0], "AT_S": eval_const[1],
                "init_H": eval_const[2], "init_S": eval_const[3],
                "q": jnp.asarray([slot_meta[s][4] for s in g_slots],
                                 jnp.int32),
            }
        else:
            tabs_g = None

        def run_seg(pp, fi, seg_valid, Ts, thr_s, minus, tabs_s, *,
                    Bs=Bs, wq_s=wq_s, wt_s=wt_s, ol=ol):
            flen = frag_lens[fi]
            start = pp - C.NUM_FLANK_BASE
            full_win = (start >= 0) & (start + wt_s <= flen)
            start_c = jnp.clip(start, 0, L - wt_s)
            jj = jnp.arange(wt_s, dtype=jnp.int32)[None, :]
            gidx = fi[:, None] * L + start_c[:, None] + jj
            wcod = frags_flat[gidx].astype(jnp.int32)     # consecutive
            wrev = jnp.flip(wcod, axis=1)
            melt_m = jnp.where(wrev <= C.DB_MAX_ATGC, 3 - wrev,
                               jnp.where(wrev == C.DB_I, 4, 99))
            melt_p = jnp.where(wcod <= C.DB_I, wcod, 99)
            melt = jnp.where(minus, melt_m, melt_p)
            needs_host = (~full_win) | jnp.any(melt > 4, axis=1)
            tb5 = jnp.where(melt <= 4, melt, 0)

            # one-hot target-pair matmul: exact (one-hot rows select
            # single integer-valued f32 entries; HIGHEST reproduces f32)
            pt6 = jnp.concatenate(
                [jnp.full((Bs, 1), 5, jnp.int32), tb5[:, :-1]], axis=1)
            ptb = pt6 * NUM_T5 + tb5
            ohp = (ptb[:, :, None]
                   == jnp.arange(30)[None, None, :]).astype(jnp.float32)
            neg1 = jnp.full((nc_all, Bs, wt_s + 1), -1, jnp.int32)
            negg = jnp.full((Bs, wt_s + 1), NEG_I32, jnp.int32)

            def row_step(carry, ts_row):
                prevM, prevIq, prevIt, best, prevMg, mgmax = carry
                # ts_row: (30, nc'*7) — this DP row's energies for every
                # (condition, energy type); ohp is row-invariant
                er = jnp.einsum('bjv,vk->bjk', ohp, ts_row,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                e = jnp.round(er).astype(jnp.int32).reshape(
                    Bs, wt_s, nc_all, 7)
                e = jnp.moveaxis(e, 2, 0)             # (nc', Bs, wt, 7)
                dgmm, dgmq, dgmt = e[..., 0], e[..., 1], e[..., 2]
                dgqi, dgqe = e[..., 3], e[..., 4]
                dgti, dgte = e[..., 5], e[..., 6]
                m = jnp.maximum(
                    jnp.maximum(_relu(prevM[..., :-1]) - dgmm,
                                _relu(prevIq[..., :-1]) - dgmq),
                    _relu(prevIt[..., :-1]) - dgmt)
                it = jnp.maximum(_relu(prevM[..., 1:]) - dgti,
                                 _relu(prevIt[..., 1:]) - dgte)
                m_shift = jnp.concatenate(
                    [jnp.full((nc_all, Bs, 1), -1, jnp.int32),
                     m[..., :-1]], axis=2)
                a = jnp.maximum(_relu(m_shift) - dgqi, -dgqe)
                ssum = jnp.cumsum(dgqe, axis=2)
                iq = jax.lax.cummax(a + ssum, axis=2) - ssum
                best = jnp.maximum(best, jnp.max(m, axis=2))
                z = neg1[..., :1]
                newM = jnp.concatenate([z, m], 2)
                newIq = jnp.concatenate([z, iq], 2)
                newIt = jnp.concatenate([z, it], 2)
                if eval_on:
                    # gapped-best channel of the EVAL condition: best
                    # M-state score among paths with >= 1 gap transition
                    # (no relu restart - that would begin a new gapless
                    # path); feeds the eval trust decision
                    g1 = jnp.where(prevMg[:, :-1] >= 0,
                                   prevMg[:, :-1] - dgmm[-1], NEG_I32)
                    mg = jnp.maximum(
                        jnp.maximum(g1,
                                    _relu(prevIq[-1, :, :-1]) - dgmq[-1]),
                        _relu(prevIt[-1, :, :-1]) - dgmt[-1])
                    newMg = jnp.concatenate([negg[:, :1], mg], 1)
                    mgmax = jnp.maximum(mgmax, jnp.max(mg, axis=1))
                    ys = newM[-1]
                else:
                    newMg = prevMg
                    ys = jnp.zeros((Bs, wt_s + 1), jnp.int32)
                return (newM, newIq, newIt, best, newMg, mgmax), ys

            init = (neg1, neg1, neg1,
                    jnp.full((nc_all, Bs), -1, jnp.int32),
                    negg, jnp.full((Bs,), NEG_I32, jnp.int32))
            (_, _, _, best, _, mgmax), M_rows = jax.lax.scan(
                row_step, init, Ts)

            keep = jnp.ones(Bs, dtype=bool)
            for c in range(num_cond):
                keep = keep & ((best[c] >= thr_s[c])
                               | (thr_s[c] == INT_MIN))

            if eval_on:
                ev = eval_segment(M_rows, mgmax, tb5, tabs_s)
                trusted = ev["trusted"] & ~needs_host & seg_valid
                w0 = (trusted.astype(jnp.int32)
                      | (ev["tm_zero"].astype(jnp.int32) << 1)
                      | (jnp.clip(ev["num_base"], 0, 255) << 2)
                      | (jnp.clip(ev["mm"], 0, 63) << 10)
                      | (jnp.clip(ev["align_len"], 0, 63) << 16))
                w1 = ((ev["fm_q"] & 0xFF)
                      | ((ev["fm_t"] & 0xFF) << 8)
                      | ((ev["lm_q"] & 0xFF) << 16)
                      | ((ev["lm_t"] & 0xFF) << 24))
                w2 = ((ev["anchor5"] & 0xFF)
                      | ((ev["anchor3"] & 0xFF) << 8))
                w3 = ev["dH"].view(jnp.int32)
                w4 = ev["dS"].view(jnp.int32)
                evw = jnp.stack([w0, w1, w2, w3, w4], axis=1)
            else:
                evw = jnp.zeros((Bs, 5), jnp.int32)
            return ((keep | needs_host) & seg_valid,
                    needs_host & seg_valid, evw)

        tabs_ax = ({"Hstk": 0, "Sstk": 0, "Hlt": 0, "Slt": 0,
                    "loop2m": 0, "AT_H": None, "AT_S": None,
                    "init_H": None, "init_S": None, "q": 0}
                   if eval_on else None)
        run_g = jax.vmap(run_seg, in_axes=(0, 0, 0, 0, 0, 0, tabs_ax))

        def go_group(args):
            return run_g(*args)

        def skip_group(args, *, Gs=Gs, Bs=Bs):
            return (jnp.zeros((Gs, Bs), bool), jnp.zeros((Gs, Bs), bool),
                    jnp.zeros((Gs, Bs, 5), jnp.int32))

        keep_g, nh_g, ev_g = jax.lax.cond(
            jnp.any(cnt_g > 0), go_group, skip_group,
            (pp_g, fi_g, seg_valid_g, Ts_g, thr_g, minus_g, tabs_g))
        for gi, s in enumerate(g_slots):
            keep_s = keep_g[gi]
            # an overflowed slot contributes nothing (host fallback)
            if num_cond:
                keep_s = keep_s & (slot_counts[s] <= seg_caps[s])
            keep_segs[s] = keep_s
            nh_segs[s] = nh_g[gi]
            ev_segs[s] = ev_g[gi]
            segpos_segs[s] = seg_start[s] + jnp.arange(Bs, dtype=jnp.int32)

    if keep_segs:
        keep_all = jnp.concatenate(keep_segs)
        nh_all = jnp.concatenate(nh_segs)
        ev_all = jnp.concatenate(ev_segs)
        segpos_all = jnp.concatenate(segpos_segs)
    else:
        keep_all = jnp.zeros(1, bool)
        nh_all = jnp.zeros(1, bool)
        ev_all = jnp.zeros((1, 5), jnp.int32)
        segpos_all = jnp.zeros(1, jnp.int32)

    # --- kept-seed compaction + kmin recomputation -----------------------
    n_kept = keep_all.sum().astype(jnp.int32)
    (kept_seg,) = jnp.nonzero(keep_all, size=bkcap,
                              fill_value=keep_all.shape[0])
    kv = kept_seg < keep_all.shape[0]
    ks = jnp.clip(kept_seg, 0, keep_all.shape[0] - 1)
    sorted_pos = jnp.clip(segpos_all[ks], 0, Bp + max_seg - 1)
    pool_idx = jnp.where(kv, order_pad[sorted_pos], 0)
    os_k = jnp.where(kv, slot_f[jnp.clip(pool_idx, 0, Bp - 1)], 0)
    p_k = jnp.where(kv, p_f[jnp.clip(pool_idx, 0, Bp - 1)], 0)
    f_k = jnp.where(kv, frag_f[jnp.clip(pool_idx, 0, Bp - 1)], 0)

    # representative word index: smallest k with a word match on the
    # diagonal (reference first-occurrence dedup, bind_oligo.cpp:33-47)
    kk = jnp.arange(max_words, dtype=jnp.int32)[None, :]
    tpos = p_k[:, None] + kk                          # (bkcap, max_words)
    tin = (tpos >= 0) & (tpos < nw_pos)
    gidx = f_k[:, None] * nw_pos + jnp.clip(tpos, 0, nw_pos - 1)
    wv = word.reshape(-1)[gidx]
    wok = word_valid.reshape(-1)[gidx] & tin
    ow_sel = oligo_words[os_k]                        # (bkcap, max_words)
    match = wok & (ow_sel >= 0) & (wv == ow_sel)
    kmin_k = jnp.min(jnp.where(match, kk, max_words), axis=1)
    kmin_k = jnp.where(kv, kmin_k, 0)

    ev_k = jnp.where(kv[:, None], ev_all[ks], 0)
    header = jnp.concatenate([
        n_kept[None], overflow.astype(jnp.int32),
        jnp.zeros(num_os, jnp.int32).at[:n_real].set(
            slot_over.astype(jnp.int32)),
        n_cand, counts.reshape(-1)])
    kept_block = jnp.stack([
        pool_idx.astype(jnp.int32), os_k, p_k, kmin_k,
        ev_k[:, 0], ev_k[:, 1], ev_k[:, 2], ev_k[:, 3], ev_k[:, 4]])

    if full:
        # pool-order keep/needs_host (tests): scatter through the sort
        dst = order_pad[jnp.clip(segpos_all, 0, Bp + max_seg - 1)]
        keep_out = jnp.zeros(Bp, bool).at[
            jnp.where(keep_all, dst, Bp)].set(True, mode="drop")
        nh_out = jnp.zeros(Bp, bool).at[
            jnp.where(nh_all, dst, Bp)].set(True, mode="drop")
        keep_out = keep_out.reshape(n, cap)
        nh_out = nh_out.reshape(n, cap)
    else:
        keep_out = jnp.zeros((n, cap), bool)
        nh_out = jnp.zeros((n, cap), bool)

    return (header, kept_block, slot, p, keep_out, nh_out,
            valid.reshape(n, cap))


@functools.lru_cache(maxsize=None)
def _panel_step(cfg_key, slot_meta, eval_const, n_frags, eval_on, full):
    """Module-level jit cache: the SAME compiled program serves every
    DevicePanel instance with identical static configuration — a fresh
    panel per search (e.g. every bench iteration) must not retrace or
    recompile (jax.jit caches by function identity, so the jit object
    itself has to be shared)."""
    (word_len, num_os, max_words, wq_max, tile_len, cap, num_cond,
     kcap) = cfg_key
    return jax.jit(functools.partial(
        panel_step_core,
        slot_meta=slot_meta, eval_const=eval_const,
        word_len=word_len, num_os=num_os, max_words=max_words,
        wq_max=wq_max, tile_len=tile_len, cap=cap,
        kcap=kcap, num_cond=num_cond, n_frags=n_frags,
        eval_on=eval_on, full=full))


class DevicePanel:
    """Host-side wrapper: packs an oligo panel once, runs fragment batches."""

    def __init__(self, panel, config, dg_tables, thresholds,
                 eval_dg=None, thermo_tables=None):
        """panel: list of dicts with keys
             words (int64[], compacted, scan order), codes (uint8[] melt),
             minus (bool)
           dg_tables: (num_cond, 2401) int32
           thresholds: (num_cond, len(panel)) int32 (INT_MIN = condition off)
           eval_dg/thermo_tables: delta_g at the ENGINE temperature and
             the santa_lucia parameter set — enable the on-device gapless
             evaluator (omit to run the screen only)
        """
        cfg = config
        self.config = cfg
        self.n_real = len(panel)
        self.eval_on = eval_dg is not None and thermo_tables is not None
        ow = np.full((cfg.num_os, cfg.max_words), -1, dtype=np.int32)
        meta = []
        ev_tabs = np.zeros((cfg.num_os, cfg.wq_max, 25, 4),
                           dtype=np.float32)
        ev_loop = np.zeros((cfg.num_os, cfg.wq_max + 2), dtype=np.float32)
        eval_const = (0.0, 0.0, 0.0, 0.0)
        for i, o in enumerate(panel):
            nw = len(o["words"])
            ow[i, :nw] = o["words"]
            codes = np.asarray(o["codes"], dtype=np.int64)
            qpr = build_qpair_rows(codes[None, :], [len(codes)],
                                   wq=len(codes))[0]
            meta.append((int(len(codes)), bool(o["minus"]),
                         tuple(int(v) for v in qpr), nw,
                         tuple(int(v) for v in codes)))
            if self.eval_on:
                from tntblast_tpu.ops.eval_gapless_jax import (
                    build_slot_eval_arrays)
                tabs = build_slot_eval_arrays(codes, thermo_tables)
                ql = len(codes)
                ev_tabs[i, :ql, :, 0] = tabs["Hstk"]
                ev_tabs[i, :ql, :, 1] = tabs["Sstk"]
                ev_tabs[i, :ql, :, 2] = tabs["Hlt"]
                ev_tabs[i, :ql, :, 3] = tabs["Slt"]
                ev_loop[i, :ql + 1] = tabs["loop2m"]
                eval_const = (float(tabs["AT_H"]), float(tabs["AT_S"]),
                              float(tabs["init_H"]), float(tabs["init_S"]))
        self.slot_meta = tuple(meta)
        self.eval_const = eval_const
        thr = np.full((cfg.num_cond, cfg.num_os), INT_MIN, dtype=np.int32)
        thr[:, :self.n_real] = thresholds
        tcan = np.stack([build_t_canon(dg_tables[c])
                         for c in range(cfg.num_cond)])
        tcan_eval = (build_t_canon(eval_dg) if self.eval_on
                     else np.zeros((30, 30, 7), np.int32))
        # word -> per-slot k-bitmask lookup (fast seeding path); gated by
        # table size and bitmask width, with a (1, num_os) dummy that
        # statically selects the dense compare fallback in _seed_fragment
        tw = 4 ** cfg.word_len
        if tw * cfg.num_os <= (16 << 20) and cfg.max_words <= 31:
            w_tab = np.zeros((tw, cfg.num_os), np.int32)
            for i, o in enumerate(panel):
                for k, v in enumerate(o["words"]):
                    w_tab[int(v), i] |= (1 << k)
        else:
            w_tab = np.zeros((1, cfg.num_os), np.int32)
        self.args = (jnp.asarray(ow), jnp.asarray(w_tab),
                     jnp.asarray(tcan), jnp.asarray(thr),
                     jnp.asarray(tcan_eval), jnp.asarray(ev_tabs),
                     jnp.asarray(ev_loop))
        self._steps = {}

    def _step(self, n_frags, full):
        cfg = self.config
        return _panel_step(cfg.key(), self.slot_meta, self.eval_const,
                           n_frags, self.eval_on, full)

    # host->device payload compression: fragments ride as a 2-bit base
    # stream (4 bases/byte) plus a sideband of N-runs and scattered
    # non-ACGT exceptions; the tile padding is synthesized on device from
    # frag_len.  4x less h2d on a link measured as low as single-digit
    # MB/s (BASELINE.md).  A fragment whose sideband overflows the fixed
    # capacities is flagged: the device marks it overflowed and the host
    # searches it directly (the existing fallback path).
    RUN_CAP = 256          # N-run capacity per fragment
    EXC_CAP = 2048         # scattered exception capacity per fragment

    def _pack_host(self, frag_code_list):
        cfg = self.config
        n = len(frag_code_list)
        L = cfg.tile_len
        packed = np.zeros((n, L // 4), dtype=np.uint8)
        lens = np.zeros(n, dtype=np.int32)
        run_s = np.full((n, self.RUN_CAP), L, dtype=np.int32)
        run_e = np.full((n, self.RUN_CAP), L, dtype=np.int32)
        exc_p = np.full((n, self.EXC_CAP), L, dtype=np.int32)
        exc_c = np.zeros((n, self.EXC_CAP), dtype=np.uint8)
        in_over = np.zeros(n, dtype=bool)
        for i, fc in enumerate(frag_code_list):
            if len(fc) > L:
                raise ValueError("fragment exceeds tile_len")
            lens[i] = len(fc)
            buf = np.zeros(L, dtype=np.uint8)
            buf[:len(fc)] = fc
            two = (buf & 3).astype(np.uint8)
            packed[i] = (two[0::4] | (two[1::4] << 2) | (two[2::4] << 4)
                         | (two[3::4] << 6))
            odd = np.flatnonzero(buf[:len(fc)] > C.DB_MAX_ATGC)
            if odd.size == 0:
                continue
            is_n = buf[odd] == C.DB_N
            npos = odd[is_n]
            rest = odd[~is_n]
            # N positions -> maximal runs
            if npos.size:
                brk = np.flatnonzero(np.diff(npos) > 1)
                starts = np.concatenate([[npos[0]], npos[brk + 1]])
                ends = np.concatenate([npos[brk] + 1, [npos[-1] + 1]])
                if len(starts) > self.RUN_CAP:
                    in_over[i] = True
                    continue
                run_s[i, :len(starts)] = starts
                run_e[i, :len(starts)] = ends
            if rest.size > self.EXC_CAP:
                in_over[i] = True
                continue
            exc_p[i, :rest.size] = rest
            exc_c[i, :rest.size] = buf[rest]
        return packed, lens, run_s, run_e, exc_p, exc_c, in_over

    def submit_fragments(self, frag_code_list, full=False):
        """Enqueue ONE batched device program covering all fragments in
        the list (async); resolve with `resolve_fragments`."""
        n = len(frag_code_list)
        payload = self._pack_host(frag_code_list)
        out = self._step(n, full)(
            *(jnp.asarray(a) for a in payload), *self.args)
        return n, out

    def _unpack_header(self, n, header):
        cfg = self.config
        n_kept = int(header[0])
        o = 1
        overflow = header[o:o + n] != 0
        o += n
        slot_over = header[o:o + cfg.num_os] != 0
        o += cfg.num_os
        n_cand = header[o:o + n]
        o += n
        counts = header[o:o + n * cfg.num_os].reshape(n, cfg.num_os)
        return n_kept, overflow, slot_over, n_cand, counts

    def resolve_fragments(self, pending):
        """Fast resolve: ONE device-to-host transfer of the packed buffer
        (kept seeds + counts); the full candidate arrays never leave the
        device."""
        n, out = pending
        cfg = self.config
        header = np.asarray(out[0])
        (n_kept, overflow, slot_over, n_cand,
         counts) = self._unpack_header(n, header)
        bkcap = cfg.batch_kcap(n)
        m = min(n_kept, bkcap)
        # second transfer: only the used prefix of the kept block
        kept = np.asarray(out[1][:, :m])
        flat_idx, os_k, p_k, kmin_k = (kept[0], kept[1],
                                       kept[2], kept[3])
        evw = kept[4:9]
        frag_of = flat_idx // cfg.cap
        kept_over = n_kept > bkcap
        results = []
        for i in range(n):
            sel = frag_of == i
            ci = counts[i][:self.n_real]
            results.append({
                "os_k": os_k[sel], "p_k": p_k[sel], "kmin_k": kmin_k[sel],
                "eval": evw[:, sel] if self.eval_on else None,
                "counts": ci, "n_kept": int(sel.sum()),
                "slot_overflow": slot_over[:self.n_real],
                "overflow": bool(overflow[i]) or kept_over,
            })
        return results

    def resolve_fragments_full(self, pending):
        """Full resolve (tests / debugging): every candidate with its
        keep/needs_host verdict — requires a submit with full=True.
        Note kmin is only materialized for KEPT candidates (screened-out
        rows report 0): the production resolve never needs the word index
        of a window it will not evaluate."""
        n, out = pending
        cfg = self.config
        header = np.asarray(out[0])
        (n_kept, overflow, slot_over, n_cand,
         counts) = self._unpack_header(n, header)
        slot, p, keep, needs_host, valid = map(np.asarray, out[2:7])
        kmin_full = np.zeros((n, cfg.cap), dtype=np.int32)
        m = min(n_kept, cfg.batch_kcap(n))
        kept = np.asarray(out[1][:, :m])
        fi = kept[0] // cfg.cap
        ri = kept[0] % cfg.cap
        kmin_full[fi, ri] = kept[3]
        results = []
        for i in range(n):
            mm = int(n_cand[i])
            ci = counts[i][:self.n_real]
            results.append({
                "os_idx": slot[i][:mm], "p": p[i][:mm],
                "kmin": kmin_full[i][:mm],
                "keep": keep[i][:mm], "needs_host": needs_host[i][:mm],
                "counts": ci,
                "slot_overflow": slot_over[:self.n_real],
                "overflow": bool(overflow[i]),
            })
        return results

    def submit_fragment(self, frag_codes, full=False):
        """Single-fragment convenience wrapper (async)."""
        return self.submit_fragments([frag_codes], full=full)

    def resolve_fragment(self, pending):
        return self.resolve_fragments_full(pending)[0]

    def resolve_fragment_fast(self, pending):
        return self.resolve_fragments(pending)[0]

    def run_fragment(self, frag_codes):
        return self.resolve_fragment(self.submit_fragment(frag_codes,
                                                          full=True))
