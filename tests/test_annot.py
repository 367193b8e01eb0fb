"""GBK/EMBL annotated-database tests.

GBK output parity vs the reference binary is covered by the gbk_* configs
in test_e2e_golden.py.  The reference's EMBL parser is broken upstream
(next_key_EMBL's gzread success check is inverted, so every EMBL input
dies), so EMBL is validated by cross-format equivalence: the same records
rendered as GBK and EMBL must parse to identical sequences/annotations
and produce identical hit output.
"""

import gzip
import io
import pathlib
import shutil
import sys

import numpy as np
import pytest

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE / "data"
GOLD = HERE / "golden" / "e2e"

pytestmark = pytest.mark.skipif(
    not (DATA / "annot_db.gbk").exists(),
    reason="annot goldens not generated")


def _load(path, fmt):
    from tntblast_tpu.io.annot import parse_embl, parse_gbk
    return parse_gbk(path) if fmt == "GBK" else parse_embl(path)


def test_embl_matches_gbk():
    gbk = _load(DATA / "annot_db.gbk", "GBK")
    embl = _load(DATA / "annot_db.embl", "EMBL")
    # GBK keeps a trailing empty molecule (reference
    # sequence_data_annot.cpp:27-37); EMBL pops it (:82-84)
    assert len(gbk) == len(embl) + 1
    assert gbk[-1].seq is None
    for g, e in zip(gbk[:-1], embl):
        assert g.accession == e.accession
        assert g.taxa_name == e.taxa_name
        assert np.array_equal(g.seq, e.seq)
        assert len(g.annotations) == len(e.annotations)
        for ga, ea in zip(g.annotations, e.annotations):
            assert (ga.type, ga.start, ga.stop, ga.complement) == \
                (ea.type, ea.start, ea.stop, ea.complement)
            assert ga.info == ea.info
            assert ga.ids == ea.ids


def test_gzip_gbk_roundtrip(tmp_path):
    src = DATA / "annot_db.gbk"
    gz = tmp_path / "annot_db.gbk.gz"
    with open(src, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    plain = _load(src, "GBK")
    packed = _load(gz, "GBK")
    assert len(plain) == len(packed)
    for p, q in zip(plain, packed):
        if p.seq is None:
            assert q.seq is None
        else:
            assert np.array_equal(p.seq, q.seq)


def test_file_type_detection(tmp_path):
    from tntblast_tpu.io.fastx import file_type
    assert file_type(DATA / "annot_db.gbk") == "GBK"
    assert file_type(DATA / "annot_db.embl") == "EMBL"
    assert file_type(DATA / "small_db.fna") == "FASTA"
    gz = tmp_path / "db.gbk.gz"
    with open(DATA / "annot_db.gbk", "rb") as fin, \
            gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    assert file_type(gz) == "GBK"


@pytest.mark.parametrize("golden,assay,fmt_args", [
    ("gbk_pcr", "assay_pcr.txt", ["-A", "PCR", "-e", "40", "-E", "40"]),
    ("gbk_probe", "assay_probe.txt", ["-A", "PROBE", "-E", "40"]),
])
def test_embl_hits_match_gbk_golden(golden, assay, fmt_args, tmp_path,
                                    monkeypatch):
    """Searching the EMBL rendering must reproduce the GBK golden hit
    list byte-for-byte (the extra empty GBK molecule yields no hits)."""
    from tntblast_tpu import cli

    out_file = tmp_path / "out.txt"
    args = ["-i", assay, "-d", "annot_db.embl"] + fmt_args \
        + ["-o", str(out_file)]
    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")
    stdout = io.StringIO()
    real = sys.stdout
    sys.stdout = stdout
    try:
        ret = cli.local_main(args, stdout=stdout)
    finally:
        sys.stdout = real
    assert ret == 0
    assert out_file.read_text() == (GOLD / f"{golden}.out").read_text()
