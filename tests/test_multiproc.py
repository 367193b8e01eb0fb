"""Multi-process distributed runtime (parallel/multiproc.py, the
reference MPI master/worker analogue, tntblast_master.cpp:28 /
tntblast_worker.cpp:23): N jax.distributed processes each search a
static shard of the (target, fragment) work-item list; results gather to
process 0, whose merged hit list must be BYTE-IDENTICAL to the recorded
reference golden (SURVEY §4 item 3)."""

import os
import pathlib
import subprocess
import sys

import pytest

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE / "data"
GOLD = HERE / "golden" / "e2e"
REPO = HERE.parent

_PORT = 9741


def _run_procs(name, num_procs, tmp_path):
    global _PORT
    _PORT += 1  # fresh port per test: no TIME_WAIT collisions
    args = (GOLD / f"{name}.cmd").read_text().split()
    out_file = tmp_path / f"{name}.out"

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
        "TNTBLAST_TPU_THREADS": "1",
        "PYTHONPATH": str(REPO),
        # one virtual device per process is enough for the gather
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    })
    procs = []
    for i in range(num_procs):
        cmd = [sys.executable, "-m", "tntblast_tpu.parallel.multiproc",
               "--coordinator", f"127.0.0.1:{_PORT}",
               "--num-procs", str(num_procs), "--proc-id", str(i), "--",
               *args, "-o", str(out_file) if i == 0
               else str(tmp_path / f"rank{i}.ignore")]
        procs.append(subprocess.Popen(
            cmd, cwd=DATA, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    return out_file


@pytest.mark.parametrize("name,num_procs", [
    ("pcr_frag", 2),      # fragmented targets: shard axis really splits
    ("taqman", 3),        # probe containment + secondary Tms
    ("inverse_target", 2),  # -m 3: merged no-match target report
])
def test_multiproc_matches_golden(name, num_procs, tmp_path):
    out_file = _run_procs(name, num_procs, tmp_path)
    got = out_file.read_text() if out_file.exists() else ""
    want = (GOLD / f"{name}.out").read_text()
    assert got == want, f"{num_procs}-process output mismatch for {name}"
