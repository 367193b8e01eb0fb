"""eval_segment (jit) vs the native engine: every window the device
marks trusted must carry bit-exact evaluation results, and the trusted
rate must stay high."""

import numpy as np
import pytest

from tntblast_tpu import native
from tntblast_tpu.ops import eval_gapless as eg
from tntblast_tpu.ops.eval_gapless_jax import (
    build_slot_eval_arrays, eval_segment)
from tntblast_tpu.thermo.santa_lucia import build_tables

NUM_BASE = 7
NUM_BP = 49
GAP = 6


@pytest.fixture(scope="module")
def engine():
    return native.MeltEngine(n_threads=1)


@pytest.fixture(scope="module")
def tables():
    return build_tables()


def _dp_rows(q, t_batch, dg):
    """numpy DP producing eval_segment's inputs: full-DP M rows plus the
    gapped-best channel max (no-restart Mg)."""
    ql = len(q)
    B, wt = t_batch.shape
    M = np.full((B, ql + 1, wt + 1), -1, dtype=np.int64)
    Iq = np.full((B, ql + 1, wt + 1), -1, dtype=np.int64)
    It = np.full((B, ql + 1, wt + 1), -1, dtype=np.int64)
    NEG = -(1 << 29)
    Mg = np.full((B, ql + 1, wt + 1), NEG, dtype=np.int64)

    def bp(a, b):
        return a * NUM_BASE + b

    relu = lambda x: np.maximum(x, 0)   # noqa: E731
    for i in range(1, ql + 1):
        qb = int(q[ql - i])
        pq = GAP if i == 1 else int(q[ql - (i - 1)])
        for j in range(1, wt + 1):
            tb = t_batch[:, j - 1]
            pt = np.full(B, GAP, dtype=np.int64) if j == 1 \
                else t_batch[:, j - 2]
            cur = bp(tb, qb)
            emm = dg[bp(pt, pq) * NUM_BP + cur]
            emq = dg[bp(pt, GAP) * NUM_BP + cur]
            emt = dg[bp(GAP, pq) * NUM_BP + cur]
            d1 = relu(M[:, i-1, j-1]) - emm
            d2 = relu(Iq[:, i-1, j-1]) - emq
            d3 = relu(It[:, i-1, j-1]) - emt
            M[:, i, j] = np.maximum(np.maximum(d1, d2), d3)
            g1 = np.where(Mg[:, i-1, j-1] >= 0,
                          Mg[:, i-1, j-1] - emm, NEG)
            Mg[:, i, j] = np.maximum(np.maximum(g1, d2), d3)
            cg = bp(tb, GAP)
            Iq[:, i, j] = np.maximum(
                relu(M[:, i, j-1]) - dg[bp(pt, qb) * NUM_BP + cg],
                relu(Iq[:, i, j-1]) - dg[bp(pt, GAP) * NUM_BP + cg])
            cg2 = bp(GAP, qb)
            It[:, i, j] = np.maximum(
                relu(M[:, i-1, j]) - dg[bp(tb, pq) * NUM_BP + cg2],
                relu(It[:, i-1, j]) - dg[bp(GAP, pq) * NUM_BP + cg2])
    M_rows = np.moveaxis(M[:, 1:, :], 0, 1).astype(np.int32)  # (ql,B,wt+1)
    mg_max = Mg[:, 1:, 1:].max(axis=(1, 2)).astype(np.int32)
    return M_rows, mg_max


def test_eval_segment_bit_exact(engine, tables):
    rng = np.random.default_rng(7)
    ql = 19
    q = rng.integers(0, 4, ql).astype(np.uint8)
    q[5] = 4    # an inosine
    wt = ql + 8
    B = 96
    t_batch = rng.integers(0, 4, (B, wt)).astype(np.int64)
    site = (3 - q[::-1].astype(np.int64)) % 4
    site[q[::-1] == 4] = rng.integers(0, 4)
    for b in range(0, B, 2):
        off = int(rng.integers(0, wt - ql + 1))
        t_batch[b, off:off + ql] = site
        for _ in range(int(rng.integers(0, 5))):
            t_batch[b, int(rng.integers(0, wt))] = rng.integers(0, 4)

    dg = engine.delta_g().astype(np.int64).reshape(-1)
    M_rows, mg_max = _dp_rows(q, t_batch, dg)

    tabs = build_slot_eval_arrays(q, tables)
    out = eval_segment(np.asarray(M_rows), np.asarray(mg_max),
                       t_batch.astype(np.int32), tabs)
    out = {k: np.asarray(v) for k, v in out.items()}

    conc = np.float32(9e-7)
    ref = engine.eval_batch(
        native.HETERO, [q] * B, [t_batch[b].astype(np.uint8)
                                 for b in range(B)],
        np.full(B, conc, dtype=np.float32))

    n_trusted = 0
    for b in range(B):
        # cross-check the trust decision against the scalar reference walk
        status = eg.trusted_path_np(q, t_batch[b], dg)[0]
        if not out["trusted"][b]:
            continue
        assert status in ("trusted", "no_align"), (b, status)
        n_trusted += 1
        if out["tm_zero"][b]:
            assert ref["tm"][b] == np.float32(0.0), b
            continue
        tm, dS_final = eg.finish_eval(out["dH"][b], out["dS"][b],
                                      int(out["num_base"][b]),
                                      engine.na, conc)
        assert tm == ref["tm"][b], (b, tm, ref["tm"][b])
        assert out["dH"][b] == ref["dH"][b], b
        assert dS_final == ref["dS"][b], b
        assert [out["fm_q"][b], out["lm_q"][b]] == list(ref["q_range"][b]), b
        q_aligned = out["lm_q"][b] - out["fm_q"][b] + 1
        assert out["mm"][b] + (ql - q_aligned) == ref["num_mm"][b], b
        assert out["anchor5"][b] == ref["anchor5"][b], b
        assert out["anchor3"][b] == ref["anchor3"][b], b

    assert n_trusted > 0.6 * B, n_trusted


@pytest.mark.parametrize("seed_val,ql", [(11, 15), (12, 18), (13, 22),
                                         (14, 25), (15, 30)])
def test_eval_segment_stress(engine, tables, seed_val, ql):
    """Bit-exactness at scale: many window populations per oligo length —
    perfect sites, 1-6 scattered mutations, clustered mismatches, random
    junk — every trusted window must match the engine exactly."""
    rng = np.random.default_rng(seed_val)
    q = rng.integers(0, 4, ql).astype(np.uint8)
    if seed_val % 2:
        q[ql // 2] = 4      # inosine
    wt = ql + 8
    B = 192
    t_batch = rng.integers(0, 4, (B, wt)).astype(np.int64)
    site = (3 - q.astype(np.int64)) % 4
    site[q == 4] = 0
    for b in range(B):
        mode = b % 4
        if mode == 0:
            off = int(rng.integers(0, wt - ql + 1))
            t_batch[b, off:off + ql] = site[::-1]
            for _ in range(int(rng.integers(0, 7))):
                t_batch[b, int(rng.integers(0, wt))] = rng.integers(0, 4)
        elif mode == 1:
            off = 4
            t_batch[b, off:off + ql] = site[::-1]
            s0 = int(rng.integers(1, ql - 5))
            m = int(rng.integers(2, 6))
            for k in range(s0, min(s0 + m, ql - 1)):
                cur = t_batch[b, off + k]
                t_batch[b, off + k] = (cur + 1 + rng.integers(0, 3)) % 4

    dg = engine.delta_g().astype(np.int64).reshape(-1)
    M_rows, mg_max = _dp_rows(q, t_batch, dg)
    tabs = build_slot_eval_arrays(q, tables)
    out = eval_segment(np.asarray(M_rows), np.asarray(mg_max),
                       t_batch.astype(np.int32), tabs)
    out = {k: np.asarray(v) for k, v in out.items()}

    conc = np.float32(9e-7)
    ref = engine.eval_batch(
        native.HETERO, [q] * B,
        [t_batch[b].astype(np.uint8) for b in range(B)],
        np.full(B, conc, dtype=np.float32))

    n_trusted = 0
    for b in range(B):
        if not out["trusted"][b]:
            continue
        n_trusted += 1
        if out["tm_zero"][b]:
            assert ref["tm"][b] == np.float32(0.0), b
            continue
        tm, dS_final = eg.finish_eval(out["dH"][b], out["dS"][b],
                                      int(out["num_base"][b]),
                                      engine.na, conc)
        assert tm == ref["tm"][b], (b, tm, ref["tm"][b])
        assert out["dH"][b] == ref["dH"][b], b
        assert dS_final == ref["dS"][b], b
        assert out["anchor5"][b] == ref["anchor5"][b], b
        assert out["anchor3"][b] == ref["anchor3"][b], b
        q_aligned = out["lm_q"][b] - out["fm_q"][b] + 1
        assert out["mm"][b] + (ql - q_aligned) == ref["num_mm"][b], b
    assert n_trusted > 0.5 * B, n_trusted
