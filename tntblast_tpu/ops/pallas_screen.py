"""Pallas TPU kernel: fused candidate-window screening DP.

One kernel invocation screens a batch of candidate windows: for each
candidate (a seed diagonal of one oligo-strand slot) it runs the
reference 3-state thermodynamic DP (reference nuc_cruc.cpp:508-693) in
int32, returning the max M-state score — bit-identical to the native
engine's align_dimer / ops.thermo_dp.dp_max_score.

Why a kernel (measured on the target chip, see BASELINE.md): XLA lowers
the per-cell 49x49 pair-of-pairs lookups to scalar gathers (~25 ms per
2048-window chunk, latency-bound).  In Pallas the score lookups collapse
into one one-hot matmul per chunk against per-slot cost tables
precomputed on the host (build_slot_tables — the same factoring as the
AVX2 host path's QueryLUT, melt_engine.cpp), and the whole DP is
branch-free vector arithmetic.

Division of labor: the host (C++ frag_search) extracts and orients the
candidate windows — irregular 32-byte memcpys the TPU's vector ISA
cannot express efficiently (Mosaic requires 128-aligned lane slices) —
and ships them as a dense (chunks, CH, wt) int8 batch; the device does
the dense compute.  The transfer is the same byte count as shipping the
fragment itself.

Layout: candidates are grouped by slot on the host and padded to CH per
chunk; the grid is (num_chunks,) with the chunk's slot id scalar-
prefetched so the right cost-table block is staged per program.  DP
states live as (CH, WT) int32 tiles (windows on sublanes, target columns
on lanes); the in-row I_query recurrence uses the same (max,+) prefix
trick as ops/thermo_dp.py, realized as log-depth lane shifts.

Restrictions (the host routes violations to its exact path, which is
always sound — screening is an optimization, never a semantic):
  * window content must be pure A/C/G/T codes (0..3),
  * full-length windows only (no fragment-edge truncation),
  * fixed (WQ, WT) per compiled kernel (WT = WQ + 2*NUM_FLANK_BASE).
"""

import functools

import numpy as np

from tntblast_tpu.jaxconf import configure as _jaxconf
_jaxconf()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tntblast_tpu.ops.thermo_dp import best_pair_table, NUM_BP

GAPC = 6          # melt-code GAP (engine alphabet)
TP5_GAP = 4       # 5-letter alphabet slot for GAP in the tp index
NTP = 25          # (prev_t, t) over the 5-letter alphabet {A,C,G,T,GAP}
NTP_PAD = 32      # padded for lane alignment
NCOST = 7         # mm, mq, mt, qi, ti, te, qe (qe replicated per row)
HUGE = 1 << 28    # cost for padded query rows: keeps scores deeply negative
CH = 256         # candidates per grid program


def build_slot_tables(oligo_codes, delta_g, wq_max):
    """Host-side per-slot cost tables: (wq_max, NCOST, NTP_PAD) int32.

    Row i (1-based DP row) fixes (qbase, prev_q) of the reversed query;
    the five pair-of-pairs costs then depend only on the target pair
    tp = prev_t*5 + t over the pure-ACGT alphabet (+ GAP for the j=1
    column).  Identical factoring to the native QueryLUT
    (melt_engine.cpp build_query_lut), restricted to ACGT targets.
    Padded rows (i > len(oligo)) carry HUGE costs so they can never
    contribute a positive score.
    """
    bp = best_pair_table()
    dg = np.asarray(delta_g, dtype=np.int64).reshape(-1)
    q = np.asarray(oligo_codes, dtype=np.int64)
    q_len = len(q)
    out = np.full((wq_max, NCOST, NTP_PAD), HUGE, dtype=np.int32)
    t5 = np.array([0, 1, 2, 3, GAPC])   # 5-letter -> melt code
    # query-independent gap-extension cost, replicated into every row
    for p5 in range(5):
        for b5 in range(4):
            out[:, 6, p5 * 5 + b5] = dg[bp[t5[p5], GAPC] * NUM_BP
                                        + bp[t5[b5], GAPC]]
    for i in range(1, q_len + 1):
        qbase = q[q_len - i]
        prev_q = GAPC if i == 1 else q[q_len - (i - 1)]
        cur_gq = bp[GAPC, qbase]
        bp_g_pq = bp[GAPC, prev_q]
        for p5 in range(5):
            pt = t5[p5]
            for b5 in range(4):          # real target bases only
                tb = t5[b5]
                tp = p5 * 5 + b5
                cur = bp[tb, qbase]
                out[i - 1, 0, tp] = dg[bp[pt, prev_q] * NUM_BP + cur]
                out[i - 1, 1, tp] = dg[bp[pt, GAPC] * NUM_BP + cur]
                out[i - 1, 2, tp] = dg[bp_g_pq * NUM_BP + cur]
                out[i - 1, 3, tp] = dg[bp[pt, qbase] * NUM_BP
                                       + bp[tb, GAPC]]
                out[i - 1, 4, tp] = dg[bp[tb, prev_q] * NUM_BP + cur_gq]
        out[i - 1, 5, :] = dg[bp_g_pq * NUM_BP + cur_gq]   # te, tp-indep
    return out


def pack_slot_tables(per_slot):
    """Stack per-slot (wq, NCOST, 32) tables: the kernel reads them as
    scalars from SMEM (one block per chunk, selected by slot id)."""
    return np.ascontiguousarray(np.stack(per_slot))


def _shift_lanes(x, d, fill):
    """Shift x right by d along the lane (last) axis, filling with fill."""
    ch = x.shape[0]
    pad = jnp.full((ch, d), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:, :-d]], axis=1)


def _screen_kernel(slot_ref, tables_ref, win_ref, out_ref, *, wq, wt):
    """Full DP for one chunk of CH windows, costs computed in place.

    Per-cell costs are built as integer mask-weighted sums: 25 per-chunk
    (prev_t, t) masks x scalar table reads from SMEM — ~75 int32
    multiply-adds per query row, all exact, no float matmul and no
    HBM-resident cost tensor (the earlier cost-materialization design
    moved 672 bytes of costs per window byte and was bandwidth-bound).
    """
    del slot_ref  # consumed by the tables index_map

    win = win_ref[0].astype(jnp.int32)                 # (CH, wt)
    prev5 = jnp.concatenate(
        [jnp.full((CH, 1), TP5_GAP, jnp.int32), win[:, :-1]], axis=1)

    # masks: 20 (prev_t in 0..4) x (t in 0..3) combos + per-base + pad
    combo = []
    for p5 in range(5):
        pm = (prev5 == p5)
        for b5 in range(4):
            combo.append((p5 * 5 + b5,
                          (pm & (win == b5)).astype(jnp.int32)))
    tb_mask = [(win == b5).astype(jnp.int32) for b5 in range(4)]
    pad_mask = (win == TP5_GAP).astype(jnp.int32)
    pad_huge = pad_mask * jnp.int32(HUGE)

    def cost_joint(i, c):
        acc = pad_huge
        for tp, mask in combo:
            acc = acc + mask * tables_ref[0, i, c, tp]
        return acc

    def cost_tb(i, c):
        # depends on the current target base only (prev_t folded out);
        # read the prev_t = A entries, identical across prev_t
        acc = pad_huge
        for b5 in range(4):
            acc = acc + tb_mask[b5] * tables_ref[0, i, c, b5]
        return acc

    relu = lambda x: jnp.maximum(x, 0)
    NEG_INF = jnp.int32(-(1 << 30))
    neg1 = jnp.full((CH, wt), -1, jnp.int32)

    # qe is row-independent: take it from row 0 and hoist its prefix sum
    dgqe = cost_joint(0, 6)
    s_qe = dgqe
    d = 1
    while d < wt:
        s_qe = s_qe + _shift_lanes(s_qe, d, 0)
        d <<= 1

    prevM, prevIq, prevIt = neg1, neg1, neg1
    best = jnp.full((CH, 1), -1, jnp.int32)

    for i in range(wq):
        dgmm = cost_joint(i, 0)
        dgmq = cost_joint(i, 1)
        dgmt = cost_tb(i, 2)
        dgqi = cost_joint(i, 3)
        dgti = cost_tb(i, 4)
        dgte = pad_huge + tables_ref[0, i, 5, 0]   # tp-independent

        m = jnp.maximum(
            jnp.maximum(relu(_shift_lanes(prevM, 1, -1)) - dgmm,
                        relu(_shift_lanes(prevIq, 1, -1)) - dgmq),
            relu(_shift_lanes(prevIt, 1, -1)) - dgmt)
        it = jnp.maximum(relu(prevM) - dgti, relu(prevIt) - dgte)

        # I_query in-row recurrence via the (max,+) prefix trick
        # (ops/thermo_dp.py): Iq = cummax(a + S) - S, S = cumsum(dgqe)
        a = jnp.maximum(relu(_shift_lanes(m, 1, -1)) - dgqi, -dgqe)
        z = a + s_qe
        d = 1
        while d < wt:
            z = jnp.maximum(z, _shift_lanes(z, d, NEG_INF))
            d <<= 1
        iq = z - s_qe

        best = jnp.maximum(best, jnp.max(m, axis=1, keepdims=True))
        prevM, prevIq, prevIt = m, iq, it

    out_ref[0, :, :] = best


@functools.partial(jax.jit, static_argnames=("wq", "wt", "interpret"))
def screen_scores(chunk_slot, windows, tables, *, wq, wt, interpret=False):
    """Max DP score for each candidate window.

    chunk_slot: (num_chunks,) int32 — slot id per chunk of CH candidates
    windows:    (num_chunks, CH, wt) int8 — oriented window codes
                (A/C/G/T = 0..3, pad = 4; minus-strand candidates already
                reverse-complemented by the host, exactly as fed to the
                exact engine — frag_search.cpp window_codes)
    tables:     (num_slots, wq, NCOST, 32) int32 (pack_slot_tables)
    Returns (num_chunks, CH, 1) int32 max scores, bit-identical to
    dp_max_score / the native align_dimer.
    """
    C = windows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, wq, NCOST, NTP_PAD),
                         lambda c, slot: (slot[c], 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CH, wt), lambda c, slot: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, 1), lambda c, slot: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_screen_kernel, wq=wq, wt=wt)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, CH, 1), jnp.int32),
        interpret=interpret,
    )(chunk_slot, tables, windows)
