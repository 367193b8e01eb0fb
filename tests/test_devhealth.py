"""Device health gate (devhealth.py): searches must fall back to the host
path — loudly, not hang — when the accelerator link is wedged or too slow
to ever pay off."""

import io

import tntblast_tpu.devhealth as dh


def _reset():
    dh._result = None


def test_cpu_backend_always_healthy(monkeypatch):
    _reset()
    ok, platform, reason = dh.device_health()
    assert ok and platform == "cpu"
    _reset()


def test_wedged_probe_times_out(monkeypatch):
    _reset()

    def hang(box):
        import time
        time.sleep(3600)

    monkeypatch.setattr(dh, "_probe", hang)
    # pretend a non-cpu backend so the probe actually runs
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ok, platform, reason = dh.device_health(timeout=0.2)
    assert not ok
    assert "did not complete" in reason
    _reset()


def test_slow_steady_state_is_unhealthy(monkeypatch):
    _reset()

    def slow(box):
        box["rtt2"] = 15.0     # alive but ~15 s per d2h: useless
        return "tpu"

    monkeypatch.setattr(dh, "_probe", slow)
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ok, platform, reason = dh.device_health(timeout=5)
    assert not ok
    assert "usefulness bound" in reason
    _reset()


def test_engine_falls_back_with_warning(monkeypatch, capsys, tmp_path):
    """--tpu-screen on an unhealthy link must run the host search and
    produce the reference-identical output, with a stderr warning."""
    import pathlib

    from tntblast_tpu import cli

    _reset()
    monkeypatch.setattr(dh, "device_health",
                        lambda timeout=None: (False, "tpu", "wedged (test)"))
    data = pathlib.Path(__file__).parent / "data"
    gold = pathlib.Path(__file__).parent / "golden" / "e2e"
    monkeypatch.chdir(data)
    monkeypatch.setenv("TNTBLAST_TPU_THREADS", "1")
    out = tmp_path / "o.out"
    ret = cli.local_main(
        ["-i", "assay_pcr.txt", "-d", "small_db.fna", "-A", "PCR",
         "-e", "40", "-E", "40", "-o", str(out), "--tpu-screen", "T",
         "-v", "F"], stdout=io.StringIO())
    assert ret == 0
    assert "device path disabled" in capsys.readouterr().err
    assert out.read_text() == (gold / "pcr_small.out").read_text()
    _reset()
