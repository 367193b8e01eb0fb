"""Measured QT feedback into the adaptive query scheduler
(reference tntblast_local.cpp:722-735, tntblast_util.cpp:1793-1844):
the running search/load ratio must actually reach query_sched (VERDICT
r4: the accumulator existed but no measurement was ever recorded, so
the adaptive branch always saw the assay-type default)."""

import io
import pathlib
import random

import pytest

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE / "data"


def test_query_sched_flips_on_ratio():
    """The cost model switches to query segmentation once the measured
    search/load ratio crosses its threshold (2 targets, 8 queries, 8
    workers: flip at s_div_h = 1/6)."""
    from tntblast_tpu import constants as C
    from tntblast_tpu.engine import query_sched

    assert not query_sched(2, 8, 8, 0.01, C.QUERY_SEGMENTATION_ADAPTIVE)
    assert query_sched(2, 8, 8, 1.0, C.QUERY_SEGMENTATION_ADAPTIVE)
    # forced modes ignore the ratio entirely
    assert query_sched(2, 8, 8, 0.01, C.QUERY_SEGMENTATION_ON)
    assert not query_sched(2, 8, 8, 1.0, C.QUERY_SEGMENTATION_OFF)


@pytest.fixture()
def many_seq_db(tmp_path):
    rng = random.Random(11)
    db = tmp_path / "many.fna"
    with open(db, "w") as fh:
        for i in range(60):
            fh.write(f">seq{i}\n")
            fh.write("".join(rng.choice("ACGT") for _ in range(4000)))
            fh.write("\n")
    return db


def test_adaptive_sched_sees_measured_ratio(many_seq_db, tmp_path,
                                            monkeypatch):
    """Under --query-seg A with a thread pool, later query_sched calls
    must receive the MEASURED running ratio, and the hit list must be
    byte-identical to the non-adaptive run."""
    from tntblast_tpu import cli, engine

    calls = []
    orig = engine.query_sched

    def spy(num_target, num_query, num_worker, s_div_h, mode):
        calls.append((s_div_h, mode))
        return orig(num_target, num_query, num_worker, s_div_h, mode)

    monkeypatch.setattr(engine, "query_sched", spy)
    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "2")

    out_a = tmp_path / "a.out"
    ret = cli.local_main(
        ["-i", "assay_pcr.txt", "-d", str(many_seq_db), "-A", "PCR",
         "-e", "30", "-E", "30", "--query-seg", "adaptive",
         "-o", str(out_a), "-v", "F"], stdout=io.StringIO())
    assert ret == 0
    assert len(calls) > 1
    first_ratio = calls[0][0]
    measured = [r for r, _ in calls[1:] if r != first_ratio]
    assert measured, (
        "no query_sched call ever received a measured ratio; the "
        "adaptive branch still sees only the default")
    assert all(r >= 0 for r, _ in calls)

    out_b = tmp_path / "b.out"
    monkeypatch.setattr(engine, "query_sched", orig)
    ret = cli.local_main(
        ["-i", "assay_pcr.txt", "-d", str(many_seq_db), "-A", "PCR",
         "-e", "30", "-E", "30",
         "-o", str(out_b), "-v", "F"], stdout=io.StringIO())
    assert ret == 0
    assert out_a.read_text() == out_b.read_text(), (
        "adaptive segmentation changed the hit list")
