"""Bit-exact parity of the native melt engine vs reference fixtures.

Golden data: tests/golden/melt_fixtures.json (reference build evaluations:
perfect-match duplexes, heterodimers on both strand orientations, hairpins,
homodimers, Dinkelbach mode), all with Tm/dH/dS float values and rendered
alignment strings.
"""

import json

import numpy as np
import pytest

from tests.conftest import GOLDEN_DIR
from tntblast_tpu import native
from tntblast_tpu.native import MeltEngine, seq_to_codes

COMP = {"A": "T", "T": "A", "G": "C", "C": "G", "I": "I",
        "M": "K", "R": "Y", "S": "S", "V": "B", "W": "W",
        "Y": "R", "H": "D", "K": "M", "D": "H", "B": "V", "N": "N"}


def window_to_minus_target(window):
    """bind_oligo_to_minus_strand: push_front(complement) over the window."""
    return seq_to_codes("".join(COMP[c] for c in reversed(window)))


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_DIR / "melt_fixtures.json") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def engine():
    return MeltEngine(target_T=310.15, na=0.05, n_threads=1)


def test_tm_pm_duplex(golden, engine):
    cases = golden["tm_pm_duplex"]
    q_rows, t_rows = [], []
    for c in cases:
        q_rows.append(seq_to_codes(c["seq"]))
        t_rows.append(seq_to_codes("".join(COMP[x] for x in c["seq"])))
    sc = np.full(len(cases), 9e-7, dtype=np.float32)
    tm, dH, dS, ok = engine.eval_alignments(q_rows, t_rows, sc)
    for i, c in enumerate(cases):
        assert tm[i] == np.float32(c["tm"]), c["seq"]
        assert dH[i] == np.float32(c["dH"])
        assert dS[i] == np.float32(c["dS"])


@pytest.mark.parametrize("key,minus", [("heterodimer", True),
                                       ("heterodimer_plus", False)])
def test_heterodimer(golden, engine, key, minus):
    cases = golden[key]
    queries = [seq_to_codes(c["query"]) for c in cases]
    if minus:
        targets = [window_to_minus_target(c["window"]) for c in cases]
    else:
        targets = [seq_to_codes(c["window"]) for c in cases]
    sc = np.full(len(cases), 9e-7, dtype=np.float32)
    out = engine.eval_batch(native.HETERO, queries, targets, sc, n_threads=1)
    n_bad = 0
    for i, c in enumerate(cases):
        ctx = f"{key}[{i}] q={c['query']} w={c['window']}"
        try:
            assert out["tm"][i] == np.float32(c["tm"]), ctx
            assert out["dH"][i] == np.float32(c["dH"]), ctx
            assert out["dS"][i] == np.float32(c["dS"]), ctx
            assert out["anchor5"][i] == c["anchor5"], ctx
            assert out["anchor3"][i] == c["anchor3"], ctx
            assert out["num_mm"][i] == c["num_mm"], ctx
            assert out["num_gap"][i] == c["num_gap"], ctx
            assert list(out["q_range"][i]) == c["qr"], ctx
            assert list(out["t_range"][i]) == c["tr"], ctx
            assert out["align"][i] == c["align"], (
                f"{ctx}\n--- got ---\n{out['align'][i]}\n--- want ---\n{c['align']}")
            if "max_degen" in c:
                assert out["max_degen"][i] == c["max_degen"], ctx
            if "dp_dg" in c:
                assert out["dp_dg"][i] == np.float32(c["dp_dg"]), ctx
        except AssertionError as e:
            n_bad += 1
            if n_bad <= 3:
                print(e)
    assert n_bad == 0, f"{n_bad}/{len(cases)} mismatching cases"


def test_hairpin(golden, engine):
    cases = golden["hairpin"]
    queries = [seq_to_codes(c["seq"]) for c in cases]
    sc = np.full(len(cases), 9e-7, dtype=np.float32)
    out = engine.eval_batch(native.HAIRPIN, queries, None, sc, n_threads=1)
    for i, c in enumerate(cases):
        assert out["tm"][i] == np.float32(c["tm"]), c["seq"]
        assert out["dH"][i] == np.float32(c["dH"]), c["seq"]
        assert out["dS"][i] == np.float32(c["dS"]), c["seq"]


def test_homodimer(golden, engine):
    cases = golden["homodimer"]
    queries = [seq_to_codes(c["seq"]) for c in cases]
    # strand(9e-7, 9e-7) combines to Ct = a - 0.5*b (reference nuc_cruc.h:890)
    sc = np.full(len(cases), np.float32(9e-7) - np.float32(0.5) * np.float32(9e-7),
                 dtype=np.float32)
    out = engine.eval_batch(native.HOMO, queries, None, sc, n_threads=1)
    for i, c in enumerate(cases):
        assert out["tm"][i] == np.float32(c["tm"]), c["seq"]
        assert out["dH"][i] == np.float32(c["dH"]), c["seq"]
        assert out["dS"][i] == np.float32(c["dS"]), c["seq"]


def test_heterodimer_dinkelbach(golden):
    eng = MeltEngine(target_T=310.15, na=0.05, dinkelbach=True, n_threads=1)
    cases = golden["heterodimer_dinkelbach"]
    queries = [seq_to_codes(c["query"]) for c in cases]
    targets = [window_to_minus_target(c["window"]) for c in cases]
    sc = np.full(len(cases), 9e-7, dtype=np.float32)
    out = eng.eval_batch(native.HETERO, queries, targets, sc, n_threads=1)
    for i, c in enumerate(cases):
        assert out["tm"][i] == np.float32(c["tm"]), f"[{i}] {c['query']}"
        assert out["dH"][i] == np.float32(c["dH"])
        assert out["dS"][i] == np.float32(c["dS"])


def test_delta_g_matches_python(engine):
    from tntblast_tpu.thermo import build_tables, update_dp_param
    t = build_tables()
    for T in (310.15, 273.15, 330.0):
        np.testing.assert_array_equal(
            engine.delta_g(T), update_dp_param(t, np.float32(T), np.float32(0.05)))
