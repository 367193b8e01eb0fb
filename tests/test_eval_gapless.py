"""Differential test: the gapless device evaluator (ops/eval_gapless)
must reproduce the native engine's evaluation BIT-EXACTLY for every
window it marks trusted.  Reference: nuc_cruc.cpp:492-2299 via the
native melt engine."""

import numpy as np
import pytest

from tntblast_tpu import native
from tntblast_tpu.ops import eval_gapless as eg
from tntblast_tpu.thermo.santa_lucia import build_tables


@pytest.fixture(scope="module")
def engine():
    return native.MeltEngine(n_threads=1)


@pytest.fixture(scope="module")
def tables():
    return build_tables()


def _rand_cases(rng, n_cases, with_sites=True):
    """Random (oligo, window) pairs: pure-random plus planted near-match
    sites with 0-4 mutations (the realistic seeded-window population)."""
    cases = []
    for _ in range(n_cases):
        ql = int(rng.integers(15, 26))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        wt = ql + 8
        if with_sites and rng.random() < 0.7:
            # plant the reverse-complement site (what a seeded minus-
            # strand window looks like after orientation)
            t = rng.integers(0, 4, wt).astype(np.uint8)
            site = (3 - q[::-1]) % 4
            off = int(rng.integers(0, wt - ql + 1))
            t[off:off + ql] = site[::-1][::-1]
            nmut = int(rng.integers(0, 5))
            for _ in range(nmut):
                pos = int(rng.integers(0, ql))
                t[off + pos] = rng.integers(0, 4)
        else:
            t = rng.integers(0, 4, wt).astype(np.uint8)
        # occasional inosine in the query (degenerate expansion emits I)
        if rng.random() < 0.1:
            q[rng.integers(0, ql)] = 4
        cases.append((q, t))
    return cases


def test_trusted_eval_bit_exact(engine, tables):
    rng = np.random.default_rng(42)
    cases = _rand_cases(rng, 400)
    dg = engine.delta_g().astype(np.int64).reshape(-1)
    conc = np.float32(9e-7)

    qs = [q for q, _ in cases]
    ts = [t for _, t in cases]
    ref = engine.eval_batch(native.HETERO, qs, ts,
                            np.full(len(cases), conc, dtype=np.float32))

    n_trusted = n_host = n_noalign = 0
    for k, (q, t) in enumerate(cases):
        status, qi0, qi1, ti0 = eg.trusted_path_np(q, t, dg)
        if status == "host":
            n_host += 1
            continue
        if status == "no_align":
            n_noalign += 1
            assert ref["tm"][k] == np.float32(0.0), k
            continue
        n_trusted += 1
        r = eg.evaluate_gapless_np(q, t, qi0, qi1, ti0, tables)
        if not r["ok"] or r["align_len"] < 3:
            assert ref["tm"][k] == np.float32(0.0), (k, r)
            continue
        tm, dS_final = eg.finish_eval(r["dH"], r["dS"], r["num_base"],
                                      engine.na, conc)
        assert tm == ref["tm"][k], (k, tm, ref["tm"][k])
        assert r["dH"] == ref["dH"][k], (k, r["dH"], ref["dH"][k])
        assert dS_final == ref["dS"][k], (k, dS_final, ref["dS"][k])
        # alignment ranges (reference alignment_range accessors)
        assert [r["fm_q"], r["lm_q"]] == list(ref["q_range"][k]), k
        assert [r["fm_t"], r["lm_t"]] == list(ref["t_range"][k])[::-1] \
            or [r["lm_t"], r["fm_t"]] == list(ref["t_range"][k]), k
        # mismatches: in-alignment + unaligned query bases
        q_aligned = r["lm_q"] - r["fm_q"] + 1
        assert r["mm"] + (len(q) - q_aligned) == ref["num_mm"][k], k
        assert ref["num_gap"][k] == 0, k
        # anchors from the trusted path
        a5 = 0
        ti = r["fm_q"] + r["fm_t"]
        for qi in range(len(q)):
            if ti - qi < 0 or ti - qi >= len(t):
                break
            if not eg.is_comp5(int(q[qi]), int(t[ti - qi])):
                break
            a5 += 1
        assert a5 == ref["anchor5"][k], k
        a3 = 0
        ti = (r["lm_q"] + r["lm_t"] + 1) - len(q)
        if 0 <= ti < len(t):
            qi = len(q) - 1
            while qi >= 0 and ti < len(t) and \
                    eg.is_comp5(int(q[qi]), int(t[ti])):
                a3 += 1
                qi -= 1
                ti += 1
        assert a3 == ref["anchor3"][k], k

    # the trusted class must dominate for this to matter
    assert n_trusted > 0.75 * len(cases), (n_trusted, n_host, n_noalign)
