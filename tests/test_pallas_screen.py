"""Pallas screening kernel: bit-exactness vs the verified device DP
(ops/thermo_dp.dp_max_score, itself tested bit-exact vs the native
engine's align_dimer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tntblast_tpu import constants as C
from tntblast_tpu.native import MeltEngine
from tntblast_tpu.ops.thermo_dp import dp_max_score
from tntblast_tpu.ops import pallas_screen as ps


@pytest.fixture(scope="module")
def engine():
    return MeltEngine(n_threads=1)


def _expected_scores(oligo, frag, starts, minus, dg, wq, wt):
    qs, ts = [], []
    for s, m in zip(starts, minus):
        win = frag[s:s + wt]
        if m:
            win = (3 - win)[::-1]
        ts.append(win.astype(np.int32))
        qs.append(oligo.astype(np.int32))
    B = len(qs)
    qc = np.zeros((B, wq), np.int32)
    tc = np.zeros((B, wt), np.int32)
    for k in range(B):
        qc[k, :len(qs[k])] = qs[k]
        tc[k] = ts[k]
    ql = np.array([len(q) for q in qs], np.int32)
    tl = np.full(B, wt, np.int32)
    return np.asarray(dp_max_score(
        jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(tc), jnp.asarray(tl),
        jnp.asarray(dg.reshape(-1)), wq=wq, wt=wt))


def test_kernel_matches_reference_dp(engine):
    rng = np.random.default_rng(7)
    dg = engine.delta_g()
    wq, wt = 24, 32
    L = 4096

    frag = rng.integers(0, 4, L).astype(np.int32)
    oligos = [rng.integers(0, 4, int(rng.integers(18, wq + 1)))
              .astype(np.uint8) for _ in range(3)]
    # plant a perfect site for oligo 0 so high scores are exercised
    site = 100
    frag[site:site + len(oligos[0])] = (3 - oligos[0])[::-1]

    tables = ps.pack_slot_tables(
        [ps.build_slot_tables(o, dg, wq) for o in oligos])

    n_chunks = 3
    starts = rng.integers(0, L - wt, (n_chunks, ps.CH)).astype(np.int32)
    starts[0, 0] = max(0, site - 4)
    minus = rng.integers(0, 2, (n_chunks, ps.CH)).astype(np.int32)
    chunk_slot = np.arange(n_chunks, dtype=np.int32)

    windows = np.zeros((n_chunks, ps.CH, wt), np.int8)
    for c in range(n_chunks):
        for k in range(ps.CH):
            w = frag[starts[c, k]:starts[c, k] + wt]
            windows[c, k] = (3 - w)[::-1] if minus[c, k] else w

    got = np.asarray(ps.screen_scores(
        jnp.asarray(chunk_slot), jnp.asarray(windows), jnp.asarray(tables),
        wq=wq, wt=wt, interpret=True))

    for c in range(n_chunks):
        want = _expected_scores(oligos[c], frag, starts[c], minus[c],
                                dg, wq, wt)
        assert np.array_equal(got[c, :, 0], want), (
            f"chunk {c}: {got[c, :8, 0]} vs {want[:8]}")
