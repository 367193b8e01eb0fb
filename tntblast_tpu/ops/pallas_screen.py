"""Pallas TPU kernel for the flat screening DP (+ eval DP channels).

The XLA formulation of the screen scan (parallel/device_search.py
run_chunk) round-trips every DP state tensor through HBM once per query
row and pays MXU-hostile batched-tiny einsums for the energy selection
(BASELINE.md round-5 bisection).  This kernel keeps the whole
3-state x conditions DP resident in VMEM for a block of windows and
selects energies from the slot's (30 x nc*7) int32 row table with a
vectorized select chain — no HBM traffic between rows, no f32 one-hot
matmuls, bit-identical integer arithmetic.  All in-kernel tensors keep
the window-batch axis LAST (the 8x128 lane axis).

Blocks are SLOT-HOMOGENEOUS: the caller lays the pooled candidate
stream out so each BB-entry block holds windows of one oligo slot
(parallel/device_search.py pads each slot's segment to a block
multiple), and per-block scalars (slot id, oligo length, window width,
validity) arrive via scalar prefetch; the slot's energy-table slice is
DMA'd per block through a prefetch-driven index map.

Outputs per entry: the DP M rows (for the gapless evaluator), the
per-condition max score (the screen verdict input), and the gapped-best
channel max (the eval trust input) — exactly the quantities the XLA
scan produces, asserted equal in tests/test_pallas_screen.py.
"""

import functools

import numpy as np

from tntblast_tpu.jaxconf import configure as _jaxconf
_jaxconf()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_I32 = -(1 << 29)

# windows per kernel block (VMEM: ~10 planes x wt x BB int32 ~ 1.3 MB)
BLOCK = 512


def _shift_down(x, axis, fill):
    """x[..., j-1, ...] with `fill` at j=0 (the DP boundary column)."""
    n = x.shape[axis]
    idx_head = [slice(None)] * x.ndim
    idx_head[axis] = slice(0, 1)
    head = jnp.full(x[tuple(idx_head)].shape, fill, x.dtype)
    idx_body = [slice(None)] * x.ndim
    idx_body[axis] = slice(0, n - 1)
    return jnp.concatenate([head, x[tuple(idx_body)]], axis=axis)


def _prefix_max(x, axis):
    """Inclusive running max along `axis` (Hillis-Steele shifts; avoids
    relying on a lax.cummax Mosaic lowering)."""
    n = x.shape[axis]
    sh = 1
    while sh < n:
        idx_body = [slice(None)] * x.ndim
        idx_body[axis] = slice(0, n - sh)
        idx_head = [slice(None)] * x.ndim
        idx_head[axis] = slice(0, sh)
        head = jnp.full(x[tuple(idx_head)].shape, NEG_I32, x.dtype)
        x = jnp.maximum(x, jnp.concatenate(
            [head, x[tuple(idx_body)]], axis=axis))
        sh *= 2
    return x


def _prefix_sum(x, axis):
    n = x.shape[axis]
    sh = 1
    while sh < n:
        idx_body = [slice(None)] * x.ndim
        idx_body[axis] = slice(0, n - sh)
        idx_head = [slice(None)] * x.ndim
        idx_head[axis] = slice(0, sh)
        head = jnp.zeros(x[tuple(idx_head)].shape, x.dtype)
        x = x + jnp.concatenate([head, x[tuple(idx_body)]], axis=axis)
        sh *= 2
    return x


def _at(x, i, axis=0):
    """Static integer indexing via lax.slice (jnp's integer __getitem__
    lowers through dynamic_slice, which Mosaic does not implement)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, i, i + 1, axis=axis), [axis])


def _screen_kernel(meta_ref, ptb_ref, ts_ref, best_ref, mg_ref,
                   mrows_ref, *, wq_max, wt_max, nc_all, eval_on, BB):
    """One grid step = one slot-homogeneous block of BB windows.

    The slot's whole (wq_max, 30, nc*7) int32 energy table rides in
    SMEM (scalar reads are the SMEM fast path; reading the same scalars
    from VMEM was ~2000x slower than the DP arithmetic, and making each
    row its own grid step cost ~160 us of per-step overhead —
    BASELINE.md round 5).  All vector tensors are (wt, BB) planes with
    the window batch on lanes; the condition axis is unrolled.

    ptb_ref:   (1, wt_max, BB) target-pair values, batch on lanes
    ts_ref:    (1, wq_max, 30, nc_all*7) SMEM — the block slot's table
    best_ref:  (1, nc_all, BB)
    mg_ref:    (1, 1, BB)
    mrows_ref: (1, wq_max, wt_max, BB)
    """
    b = pl.program_id(0)
    valid = meta_ref[b, 3]
    ql = meta_ref[b, 1]
    wt_e = meta_ref[b, 2]

    @pl.when(valid == 0)
    def _skip():
        best_ref[...] = jnp.full((1, nc_all, BB), -1, jnp.int32)
        mg_ref[...] = jnp.full((1, 1, BB), NEG_I32, jnp.int32)

    @pl.when(valid == 1)
    def _run():
        relu = lambda x: jnp.maximum(x, 0)   # noqa: E731
        ptb = ptb_ref[0]                     # (wt_max, BB)
        wt = wt_max
        col_ok = (jax.lax.broadcasted_iota(jnp.int32, (wt, BB), 0)
                  < wt_e)
        neg1 = jnp.full((wt, BB), -1, jnp.int32)
        negg = jnp.full((wt, BB), NEG_I32, jnp.int32)
        masks = [ptb == v for v in range(30)]

        prevM = [neg1] * nc_all
        prevIq = [neg1] * nc_all
        prevIt = [neg1] * nc_all
        best = [jnp.full((1, BB), -1, jnp.int32)] * nc_all
        prevMg = negg
        mgmax = jnp.full((1, BB), NEG_I32, jnp.int32)

        for r in range(wq_max):
            rv = r < ql                       # traced scalar bool

            def esel(k, r=r):
                acc = jnp.zeros((wt, BB), jnp.int32)
                for v in range(30):
                    acc = jnp.where(masks[v], ts_ref[0, r, v, k], acc)
                return acc

            newM = []
            newIq = []
            newIt = []
            for c in range(nc_all):
                dgmm = esel(c * 7 + 0)
                dgmq = esel(c * 7 + 1)
                dgmt = esel(c * 7 + 2)
                dgqi = esel(c * 7 + 3)
                dgqe = esel(c * 7 + 4)
                dgti = esel(c * 7 + 5)
                dgte = esel(c * 7 + 6)
                pM = _shift_down(prevM[c], 0, -1)
                pIq = _shift_down(prevIq[c], 0, -1)
                pIt = _shift_down(prevIt[c], 0, -1)
                m = jnp.maximum(
                    jnp.maximum(relu(pM) - dgmm, relu(pIq) - dgmq),
                    relu(pIt) - dgmt)
                it = jnp.maximum(relu(prevM[c]) - dgti,
                                 relu(prevIt[c]) - dgte)
                m_shift = _shift_down(m, 0, -1)
                a = jnp.maximum(relu(m_shift) - dgqi, -dgqe)
                ssum = _prefix_sum(dgqe, axis=0)
                iq = _prefix_max(a + ssum, axis=0) - ssum
                row_best = jnp.max(jnp.where(col_ok, m, -1), axis=0,
                                   keepdims=True)
                best[c] = jnp.where(rv, jnp.maximum(best[c], row_best),
                                    best[c])
                if eval_on and c == nc_all - 1:
                    pMg = _shift_down(prevMg, 0, NEG_I32)
                    g1 = jnp.where(pMg >= 0, pMg - dgmm, NEG_I32)
                    mg = jnp.maximum(jnp.maximum(g1, relu(pIq) - dgmq),
                                     relu(pIt) - dgmt)
                    row_mg = jnp.max(jnp.where(col_ok, mg, NEG_I32),
                                     axis=0, keepdims=True)
                    mgmax = jnp.where(rv, jnp.maximum(mgmax, row_mg),
                                      mgmax)
                    prevMg = mg
                newM.append(m)
                newIq.append(iq)
                newIt.append(it)
            mrows_ref[0, r] = newM[nc_all - 1] if eval_on else newM[0]
            prevM, prevIq, prevIt = newM, newIq, newIt
        for c in range(nc_all):
            best_ref[0, c] = best[c][0]
        mg_ref[0, 0] = mgmax[0]


@functools.lru_cache(maxsize=None)
def _build_call(n_blocks, n_real, wq_max, wt_max, nc_all, eval_on, BB,
                interpret):
    kern = functools.partial(
        _screen_kernel, wq_max=wq_max, wt_max=wt_max, nc_all=nc_all,
        eval_on=eval_on, BB=BB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # meta (n_blocks, 4)
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, wt_max, BB), lambda b, meta: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq_max, 30, nc_all * 7),
                         lambda b, meta: (meta[b, 0], 0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nc_all, BB), lambda b, meta: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), lambda b, meta: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq_max, wt_max, BB),
                         lambda b, meta: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def call(meta, ptb_t, ts):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, nc_all, BB), jnp.int32),
                jax.ShapeDtypeStruct((n_blocks, 1, BB), jnp.int32),
                jax.ShapeDtypeStruct((n_blocks, wq_max, wt_max, BB),
                                     jnp.int32),
            ],
            interpret=interpret,
        )(meta, ptb_t, ts)

    return call


def screen_blocks(meta, ptb_t, ts, *, n_real, wq_max, wt_max, nc_all,
                  eval_on, BB=BLOCK, interpret=None):
    """Run the screen DP over slot-homogeneous blocks.

    meta:  (n_blocks, 4) int32 — [slot, ql, wt_e, valid] per block
    ptb_t: (n_blocks, wt_max, BB) int32 target-pair values (pt6*5+tb5)
    ts:    (n_real, wq_max, 30, nc_all*7) int32 per-slot row energies

    Returns (best (n_blocks, nc_all, BB), mgmax (n_blocks, BB),
    M_rows (n_blocks, wq_max, wt_max, BB)); M_rows[b, r, j, i] is the DP
    M value of window i of block b at DP row r+1, column j+1 (the
    column-0 boundary of the XLA formulation is implicit: always -1).
    Invalid blocks return best=-1, mgmax=NEG_I32, undefined M_rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_blocks = meta.shape[0]
    call = _build_call(n_blocks, n_real, wq_max, wt_max, nc_all,
                       eval_on, BB, bool(interpret))
    best, mg, mrows = call(meta, ptb_t, ts)
    return best, mg[:, 0], mrows
