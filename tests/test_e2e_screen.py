"""The device-DP screened pipeline must be bit-identical to the exact
pipeline: the screen is a provably-conservative filter (see screen.py),
so every golden config must produce the same output file with
--tpu-screen T.  Also asserts the screen actually prunes work on
configs with Tm thresholds."""

import io
import pathlib
import sys

import pytest

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE / "data"
GOLD = HERE / "golden" / "e2e"

# Subset covering all assay modes + fragmentation + degenerates; running
# all 15 under jit-on-CPU is slow, these exercise every screen path.
CONFIGS = ["probe_small", "probe_dg", "pcr_small", "pcr_lowtm", "taqman",
           "degen", "padlock", "mips", "pcr_frag", "pcr_dinkelbach",
           # forced query segmentation + device panel: (fragment, query)
           # work items share one batched device submission per fragment
           "query_seg", "query_seg_frag"]


@pytest.mark.parametrize("mode", ["--tpu-screen", "--tpu-frag"])
@pytest.mark.parametrize("name", CONFIGS)
def test_screened_matches_golden(name, mode, tmp_path, monkeypatch):
    from tntblast_tpu import cli

    args = (GOLD / f"{name}.cmd").read_text().split()
    out_file = tmp_path / f"{name}.out"
    args += ["-o", str(out_file), mode, "T", "-v", "F"]

    monkeypatch.chdir(DATA)
    stdout = io.StringIO()
    ret = cli.local_main(args, stdout=stdout)
    assert ret == 0
    got = out_file.read_text() if out_file.exists() else ""
    want = (GOLD / f"{name}.out").read_text()
    assert got == want, f"screened output differs from golden for {name}"


def test_screen_prunes_random_background(tmp_path, monkeypatch):
    """With a 40C Tm threshold, most seeded windows on a random-sequence
    background must be discarded on device (the fast path's speedup
    depends on this; measured ~84% at slack=4)."""
    import random

    from tntblast_tpu import cli
    from tntblast_tpu.parallel import panel as panel_mod

    rng = random.Random(1)
    db = tmp_path / "rand.fna"
    db.write_text(">rand\n"
                  + "".join(rng.choice("ACGT") for _ in range(100000)) + "\n")

    stats = {}
    orig_init = panel_mod.FragmentPanelManager.__init__

    def spy_init(self, *a, **k):
        orig_init(self, *a, **k)
        stats["obj"] = self

    monkeypatch.setattr(panel_mod.FragmentPanelManager, "__init__",
                        spy_init)
    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")
    out_file = tmp_path / "o.out"
    ret = cli.local_main(
        ["-i", "assay_pcr.txt", "-d", str(db), "-A", "PCR",
         "-e", "40", "-E", "40", "-o", str(out_file),
         "--tpu-screen", "T", "-v", "F"], stdout=io.StringIO())
    assert ret == 0
    s = stats["obj"].stats
    assert s["seeds"] > 0, s
    assert s["kept"] <= 0.4 * s["seeds"], s


def test_dinkelbach_screen_prunes(tmp_path, monkeypatch):
    """Under --dinkelbach the screen must stay ACTIVE (the slack bound is
    alignment-agnostic, test_screen_slack.py) — the dinkelbach screen run
    must both prune background windows and keep the golden output (the
    parity half runs in test_screened_matches_golden[pcr_dinkelbach])."""
    import random

    from tntblast_tpu import cli
    from tntblast_tpu.parallel import panel as panel_mod

    rng = random.Random(5)
    db = tmp_path / "rand.fna"
    db.write_text(">rand\n"
                  + "".join(rng.choice("ACGT") for _ in range(60000)) + "\n")

    stats = {}
    orig_init = panel_mod.FragmentPanelManager.__init__

    def spy_init(self, *a, **k):
        orig_init(self, *a, **k)
        stats["obj"] = self

    monkeypatch.setattr(panel_mod.FragmentPanelManager, "__init__",
                        spy_init)
    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")
    ret = cli.local_main(
        ["-i", "assay_pcr.txt", "-d", str(db), "-A", "PCR",
         "-e", "40", "-E", "40", "-o", str(tmp_path / "o.out"),
         "--dinkelbach", "T", "--tpu-screen", "T", "-v", "F"],
        stdout=io.StringIO())
    assert ret == 0
    s = stats["obj"].stats
    assert s["seeds"] > 0, s
    assert s["kept"] < s["seeds"], "dinkelbach screen pruned nothing"


def test_overflow_falls_back_to_host(tmp_path, monkeypatch, capsys):
    """A repetitive genome that overflows the device candidate capacity
    must fall back to host seeding for the affected panel groups — with
    identical output to the unscreened run and a user-visible warning
    (not just an env-gated profile counter)."""
    from tntblast_tpu import cli
    from tntblast_tpu.parallel import panel as panel_mod

    # genome = the forward primer tandem-repeated: every position seeds
    fwd = "TTGACCTAGATATTCAGCAAC"
    db = tmp_path / "rep.fna"
    db.write_text(">rep\n" + fwd * 1200 + "\n")

    stats = {}
    orig_init = panel_mod.FragmentPanelManager.__init__

    def spy_init(self, *a, **k):
        orig_init(self, *a, **k)
        stats["obj"] = self

    monkeypatch.setattr(panel_mod.FragmentPanelManager, "__init__",
                        spy_init)
    monkeypatch.setattr(panel_mod, "MAX_CAP", 2048)  # force overflow
    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")

    out_scr = tmp_path / "scr.out"
    out_ref = tmp_path / "ref.out"
    argv = ["-i", "assay_pcr.txt", "-d", str(db), "-A", "PCR",
            "-e", "40", "-E", "40", "-v", "F"]
    ret = cli.local_main(argv + ["-o", str(out_scr), "--tpu-screen", "T"],
                         stdout=io.StringIO())
    assert ret == 0
    assert stats["obj"].stats["fallback"] > 0, stats["obj"].stats
    err = capsys.readouterr().err
    assert "fell back to host seeding" in err

    ret = cli.local_main(argv + ["-o", str(out_ref)], stdout=io.StringIO())
    assert ret == 0
    assert out_scr.read_text() == out_ref.read_text()


def test_device_eval_resolves_windows(tmp_path, monkeypatch):
    """The device gapless evaluator must actually resolve windows in an
    end-to-end --tpu-screen run (dev_evaluated > 0) while keeping the
    output byte-identical — guards against the eval path silently
    degrading to screen-only."""
    import io

    from tntblast_tpu.engine import make_melt_engine, run_search
    from tntblast_tpu.io.fastx import open_database
    from tntblast_tpu.model import (
        expand_degenerate_signatures, read_input_file)
    from tntblast_tpu.options import Options
    from tntblast_tpu import output as out_mod

    monkeypatch.chdir(DATA)
    args = (GOLD / "pcr_small.cmd").read_text().split()
    out_file = tmp_path / "out.txt"
    opt = Options()
    opt.parse(args + ["-o", str(out_file), "--tpu-screen", "T", "-v", "F"])
    opt.sig_list = read_input_file(opt.input_filename, opt.ignore_probe,
                                   False)
    opt.sig_list = expand_degenerate_signatures(opt.sig_list,
                                                opt.degen_rescale_ct)
    engine = make_melt_engine(opt, n_threads=1)
    db = open_database(opt.dbase_filename)
    state = run_search(opt, db, engine, stdout=io.StringIO())
    assert state.profile["device_calls"] > 0, state.profile
    assert state.profile["dev_evaluated"] > 0, state.profile
    # device-evaluated windows replace host exact evaluations
    assert state.profile["evaluated"] < 20, state.profile


def test_device_path_on_n_run_genome(tmp_path, monkeypatch):
    """End-to-end guard for the packed upload + degenerate routing: a
    genome with assembly-gap N runs, scattered IUPAC bases and planted
    amplicons must produce byte-identical output with the device panel
    (which ships fragments as a 2-bit stream with an N-run/exception
    sideband and routes degenerate windows to the host)."""
    import random

    from tntblast_tpu import cli

    rng = random.Random(99)
    seq = [rng.choice("ACGT") for _ in range(200000)]
    # planted amplicon: forward site ... reverse-complement site
    fwd = "TTGACCTAGATATTCAGCAAC"
    rev = "GGGAGAGACTCACCCAAAGATC"
    revc = rev.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    for base_pos in (30000, 120000):
        seq[base_pos:base_pos + len(fwd)] = fwd
        stop = base_pos + 700
        seq[stop:stop + len(revc)] = revc
    # N runs (one right next to a planted site) + scattered degenerates
    for start, ln in ((15000, 800), (30000 - 60, 50), (90000, 3000)):
        seq[start:start + ln] = "N" * ln
    for _ in range(200):
        seq[rng.randrange(len(seq))] = rng.choice("RYSWKMBDHVN")
    db = tmp_path / "nrun.fna"
    db.write_text(">nrun\n" + "".join(seq) + "\n")
    assays = tmp_path / "assays.txt"
    assays.write_text(f"pcr1\t{fwd}\t{rev}\n")

    monkeypatch.chdir(tmp_path)
    argv = ["-i", str(assays), "-d", str(db), "-A", "PCR",
            "-e", "40", "-E", "45", "-l", "2000",
            "--max-target-len", "60000", "-v", "F"]
    out_host = tmp_path / "host.out"
    out_dev = tmp_path / "dev.out"
    assert cli.local_main(argv + ["-o", str(out_host)],
                          stdout=io.StringIO()) == 0
    assert cli.local_main(argv + ["-o", str(out_dev), "--tpu-screen", "T"],
                          stdout=io.StringIO()) == 0
    host_text = out_host.read_text()
    assert host_text == out_dev.read_text()
    assert "pcr1" in host_text    # the planted amplicons were found


def test_padlock_swapped_arm_roles_device(tmp_path, monkeypatch):
    """An oligo used as the DOWNSTREAM arm in one assay and the UPSTREAM
    arm in another gets two slots with different ligation-clamp filters;
    the injected-slot map is keyed per (oligo, strand), so one slot wins
    and the other search must detect the full-filter mismatch and fall
    back to host seeding — output must stay byte-identical either way."""
    import random

    from tntblast_tpu import cli

    rng = random.Random(5)
    up = "TTGACCTAGATATTCAGCAAC"
    down = "GGGAGAGACTCACCCAAAGATC"
    seq = [rng.choice("ACGT") for _ in range(60000)]
    # adjacent ligation site for (down, up) on the minus strand:
    # plus strand carries down then up back-to-back
    site = down + up
    seq[20000:20000 + len(site)] = site
    # and the swapped arrangement elsewhere
    site2 = up + down
    seq[40000:40000 + len(site2)] = site2
    db = tmp_path / "pad.fna"
    db.write_text(">pad\n" + "".join(seq) + "\n")
    assays = tmp_path / "assays.txt"
    assays.write_text(f"padA\t{down}\t{up}\npadB\t{up}\t{down}\n")

    monkeypatch.chdir(tmp_path)
    argv = ["-i", str(assays), "-d", str(db), "-A", "PADLOCK",
            "-E", "40", "--probe-clamp5", "2", "-v", "F"]
    out_host = tmp_path / "host.out"
    out_dev = tmp_path / "dev.out"
    assert cli.local_main(argv + ["-o", str(out_host)],
                          stdout=io.StringIO()) == 0
    assert cli.local_main(argv + ["-o", str(out_dev), "--tpu-screen", "T"],
                          stdout=io.StringIO()) == 0
    host_text = out_host.read_text()
    assert host_text == out_dev.read_text()
    assert "padA" in host_text and "padB" in host_text


@pytest.mark.parametrize("name", ["query_seg", "query_seg_frag",
                                  "pcr_frag"])
def test_screened_threaded_matches_golden(name, tmp_path, monkeypatch):
    """The threaded pool combined with the device panel — including
    forced query segmentation (VERDICT r4 #9: this combination used to
    drop to the sequential loop) — must still be byte-identical."""
    from tntblast_tpu import cli

    args = (GOLD / f"{name}.cmd").read_text().split()
    out_file = tmp_path / f"{name}.out"
    args += ["-o", str(out_file), "--tpu-screen", "T", "-v", "F"]

    monkeypatch.chdir(DATA)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "4")
    ret = cli.local_main(args, stdout=io.StringIO())
    assert ret == 0
    got = out_file.read_text() if out_file.exists() else ""
    want = (GOLD / f"{name}.out").read_text()
    assert got == want, f"threaded screened output differs for {name}"


def test_adaptive_host_screen_output_invariant(tmp_path, monkeypatch):
    """The adaptive host-screen gate (native frag_search: disable once
    measured cycle rates show the screen net-negative) must reach its
    decision sample on a multi-Mb database and produce output identical
    to forced-on and forced-off — the decision only moves work."""
    import random
    import subprocess
    import sys as _sys

    rng = random.Random(9)
    db = tmp_path / "big.fna"
    with open(db, "w") as fh:
        fwd = "TTGACCTAGATATTCAGCAAC"
        rev = "GGGAGAGACTCACCCAAAGATC"
        rc_map = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rev_rc = "".join(rc_map[c] for c in reversed(rev))
        filler = "".join(rng.choice("ACGT") for _ in range(80))
        site = fwd + filler + rev_rc                # a full amplicon
        seq = list("".join(rng.choice("ACGT") for _ in range(3_000_000)))
        for pos in range(50_000, 2_900_000, 120_000):
            seq[pos:pos + len(site)] = site
        fh.write(">big\n" + "".join(seq) + "\n")

    outs = {}
    for hs in ("adaptive", "1", "0"):
        env = dict(__import__("os").environ)
        env.update({"TNTBLAST_TPU_THREADS": "2", "JAX_PLATFORMS": "cpu",
                    "PYTHONPATH": str(HERE.parent)})
        if hs == "adaptive":
            env.pop("TNTBLAST_TPU_HOST_SCREEN", None)
        else:
            env["TNTBLAST_TPU_HOST_SCREEN"] = hs
        out = tmp_path / f"o{hs}.out"
        rc = subprocess.call(
            [_sys.executable, "-m", "tntblast_tpu", "-i",
             str(DATA / "assay_pcr.txt"), "-d", str(db), "-A", "PCR",
             "-e", "40", "-E", "40", "-o", str(out), "-v", "F"],
            env=env, cwd=DATA, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        assert rc == 0, hs
        outs[hs] = out.read_text()
    assert outs["adaptive"] == outs["1"] == outs["0"]
    assert outs["adaptive"].strip(), "expected hits from planted sites"
