"""BLAST v4 database reader/writer: round-trip fidelity and engine
hit-list equality against the same data read as FASTA.

No NCBI toolkit exists in this environment to cross-validate the volume
bytes, so these tests are the correctness contract: write -> read
round-trips every base code (incl. degenerate runs through the ambiguity
records), and the full search pipeline produces an identical hit list
(modulo the identical deflines) from either container."""

import io
import pathlib
import re

import numpy as np
import pytest

from tntblast_tpu import constants as C
from tntblast_tpu.io import blastdb
from tntblast_tpu.io.fastx import open_database

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE / "data"


def _codes(seq):
    return C.ASCII_TO_DB[np.frombuffer(seq.encode(), np.uint8)]


def test_roundtrip_sequences(tmp_path):
    rng = np.random.default_rng(3)
    recs = []
    for i, n in enumerate([1, 4, 5, 37, 4096, 10001]):
        seq = rng.integers(0, 4, n).astype(np.uint8)
        # sprinkle degenerate bases incl. runs
        if n > 50:
            seq[10] = C.DB_N
            seq[20:25] = C.DB_R
            seq[n - 1] = C.DB_Y
        recs.append((f"acc{i} test record {i}", seq))
    base = str(tmp_path / "db")
    blastdb.create_db(base, recs)

    db = blastdb.BlastDb(base)
    assert db.size() == len(recs)
    for i, (defline, seq) in enumerate(recs):
        got_def, got = db.read(i)
        assert got_def == defline
        assert np.array_equal(got, seq), f"record {i} length {len(seq)}"
        # ranged read
        if len(seq) > 10:
            _, sub = db.read(i, 3, 9)
            assert np.array_equal(sub, seq[3:10])


def test_defline_codec():
    dl = [("acc1 some title", "acc1"), ("x", "x")]
    raw = blastdb.encode_deflines(dl)
    assert blastdb.decode_deflines(raw) == dl


def test_oid_filtering(tmp_path):
    recs = [(f"acc{i} rec", _codes("ACGT" * 30)) for i in range(4)]
    base = str(tmp_path / "db")
    blastdb.create_db(base, recs)
    inc = blastdb.BlastDb(base, include=["acc1", "acc3"])
    assert inc.size() == 2
    assert inc.defline(0) == "acc1 rec"
    exc = blastdb.BlastDb(base, exclude=["acc0"])
    assert exc.size() == 3
    assert exc.defline(0) == "acc1 rec"


def test_search_matches_fasta(tmp_path, monkeypatch):
    """PCR search over the BLAST volume == search over the FASTA file."""
    from tntblast_tpu import cli

    fasta = DATA / "small_db.fna"
    fdb = open_database(str(fasta))
    recs = []
    for i in range(fdb.size()):
        defline, seq = fdb.read(i)
        recs.append((defline, seq))
    base = str(tmp_path / "vol")
    blastdb.create_db(base, recs)

    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")
    out_f = tmp_path / "fasta.out"
    out_b = tmp_path / "blast.out"
    for dbpath, out in ((str(fasta), out_f), (base, out_b)):
        ret = cli.local_main(
            ["-i", "assay_pcr.txt", "-d", dbpath, "-A", "PCR",
             "-e", "40", "-E", "40", "-o", str(out)],
            stdout=io.StringIO())
        assert ret == 0
    assert out_f.read_text() == out_b.read_text()
