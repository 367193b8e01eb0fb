"""Pallas screen kernel vs the XLA scan recurrence: best scores, the
gapped-best channel and every M row must agree exactly on random
slot-homogeneous blocks (interpret mode on CPU)."""

import numpy as np
import pytest


def _xla_reference(ptb, ts_slot, ql, wt_e, nc_all, eval_on):
    """Direct transcription of device_search.run_chunk's row_step for
    ONE slot-homogeneous batch (B, wt).  Returns (best (nc, B),
    mgmax (B,), M_rows (wq, B, wt))."""
    NEG = -(1 << 29)
    B, wt = ptb.shape
    wq = ts_slot.shape[0]
    relu = lambda x: np.maximum(x, 0)   # noqa: E731
    prevM = np.full((nc_all, B, wt), -1, np.int64)
    prevIq = prevM.copy()
    prevIt = prevM.copy()
    best = np.full((nc_all, B), -1, np.int64)
    prevMg = np.full((B, wt), NEG, np.int64)
    mgmax = np.full(B, NEG, np.int64)
    col_ok = np.arange(wt)[None, :] < wt_e
    M_rows = np.zeros((wq, B, wt), np.int64)
    for r in range(wq):
        e = ts_slot[r][ptb]                      # (B, wt, nc*7)
        e = np.moveaxis(e.reshape(B, wt, nc_all, 7), 2, 0)
        dgmm, dgmq, dgmt = e[..., 0], e[..., 1], e[..., 2]
        dgqi, dgqe = e[..., 3], e[..., 4]
        dgti, dgte = e[..., 5], e[..., 6]

        def shl(x, fill=-1):
            out = np.full_like(x, fill)
            out[..., 1:] = x[..., :-1]
            return out

        m = np.maximum(
            np.maximum(relu(shl(prevM)) - dgmm,
                       relu(shl(prevIq)) - dgmq),
            relu(shl(prevIt)) - dgmt)
        it = np.maximum(relu(prevM) - dgti, relu(prevIt) - dgte)
        a = np.maximum(relu(shl(m)) - dgqi, -dgqe)
        iq = np.empty_like(a)
        iq[..., 0] = a[..., 0]
        for j in range(1, wt):
            iq[..., j] = np.maximum(a[..., j], iq[..., j - 1]
                                    - dgqe[..., j])
        if r < ql:
            best = np.maximum(best,
                              np.where(col_ok[None], m, -1).max(axis=2))
        if eval_on:
            pMg = shl(prevMg[None], NEG)[0]
            g1 = np.where(pMg >= 0, pMg - dgmm[-1], NEG)
            mg = np.maximum(np.maximum(g1, relu(shl(prevIq[-1]))
                                       - dgmq[-1]),
                            relu(shl(prevIt[-1])) - dgmt[-1])
            if r < ql:
                mgmax = np.maximum(
                    mgmax, np.where(col_ok, mg, NEG).max(axis=1))
            prevMg = mg
            M_rows[r] = m[-1]
        else:
            M_rows[r] = m[0]
        prevM, prevIq, prevIt = m, iq, it
    return best, mgmax, M_rows


@pytest.mark.parametrize("eval_on", [False, True])
def test_pallas_screen_matches_reference(eval_on):
    from tntblast_tpu.ops.pallas_screen import screen_blocks

    rng = np.random.default_rng(5)
    BB = 128
    wq_max, wt_max = 12, 20
    nc_all = 3 if eval_on else 2
    n_real = 5
    n_blocks = 7
    ts = rng.integers(-60000, 60000,
                      (n_real, wq_max, 30, nc_all * 7)).astype(np.int32)
    meta = np.zeros((n_blocks, 4), np.int32)
    ptb = np.zeros((n_blocks, wt_max, BB), np.int32)
    refs = []
    for b in range(n_blocks):
        s = int(rng.integers(0, n_real))
        ql = int(rng.integers(4, wq_max + 1))
        wt_e = ql + 8
        valid = 0 if b == 4 else 1          # one skipped block
        meta[b] = (s, ql, wt_e, valid)
        pb = rng.integers(0, 30, (BB, wt_max)).astype(np.int32)
        ptb[b] = pb.T
        refs.append(_xla_reference(pb, ts[s].astype(np.int64), ql, wt_e,
                                   nc_all, eval_on)
                    if valid else None)

    best, mgmax, mrows = screen_blocks(
        meta, ptb, ts, n_real=n_real, wq_max=wq_max, wt_max=wt_max,
        nc_all=nc_all, eval_on=eval_on, BB=BB, interpret=True)
    best = np.asarray(best)
    mgmax = np.asarray(mgmax)
    mrows = np.asarray(mrows)

    for b, ref in enumerate(refs):
        if ref is None:
            assert (best[b] == -1).all()
            continue
        rb, rmg, rM = ref
        np.testing.assert_array_equal(best[b], rb.astype(np.int32),
                                      err_msg=f"best block {b}")
        if eval_on:
            np.testing.assert_array_equal(mgmax[b], rmg.astype(np.int32),
                                          err_msg=f"mg block {b}")
        # rows >= ql are out of contract (the kernel freezes them, the
        # XLA scan computes junk; eval_flat masks both) — compare the
        # real rows only
        ql = int(meta[b, 1])
        np.testing.assert_array_equal(
            np.moveaxis(mrows[b], 2, 1)[:ql], rM[:ql].astype(np.int32),
            err_msg=f"M_rows block {b}")
