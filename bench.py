"""Benchmark driver: end-to-end PCR search throughput on one chip.

Runs the standard benchmark config (bench_data.py: 8 Mb synthetic genome,
10-assay PCR panel, planted amplicons) through the full engine — the same
work the reference binary does — and prints ONE JSON line:

    {"metric": "pcr_search_throughput", "value": <Mbases/s>,
     "unit": "Mbases/s", "vs_baseline": <ratio>, ...}

Baseline: the reference tntblast binary (v2.77, plain `make`, OpenMP),
measured on the dev box (see BASELINE.md "Measured CPU baseline"):
3.412 Mb/s at 1 thread, 6.439 Mb/s at 2 threads (94% scaling), projected
to the BASELINE.json 32-core-node target at 32 x 0.94 x 3.412 =
102.6 Mb/s. vs_baseline is measured-throughput / 102.6.

Methodology (VERDICT r2 #8):
  * correctness gate: the hit list must be BYTE-IDENTICAL to the
    recorded reference output (sha256 in BENCH_GOLDEN_SHA256, generated
    from tntblast v2.77 on this exact config) — not a count floor;
  * median of 5 timed runs, with min/max spread reported;
  * both paths are measured when a healthy accelerator is present
    (host C++ path, and the device seed+screen path `--tpu-screen T`);
    the reported value is the better median and `path` says which.
    An unhealthy device link (devhealth.py) skips the device config
    instead of hanging.
"""

import contextlib
import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_data

# Reference binary, 1 CPU thread, measured on the dev box (BASELINE.md).
REF_MBPS_1CORE = 3.412
REF_SCALING = 0.94          # observed 1->2 core efficiency
REF_MBPS_32CORE = REF_MBPS_1CORE * 32 * REF_SCALING   # 102.6 Mb/s

GENOME_MB = (bench_data.NSEQ * bench_data.SEQLEN) / 1e6

# sha256 of the reference tntblast v2.77 output file on the bench config
# (OMP_NUM_THREADS-independent; 242 hit records).
BENCH_GOLDEN_SHA256 = (
    "4394383a49dbcbe751377f977fa7509c124c243350c755a72bbf876156d66b05")


def _sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _fail(msg):
    print(json.dumps({"metric": "pcr_search_throughput", "value": 0.0,
                      "unit": "Mbases/s", "vs_baseline": 0.0, "error": msg}))
    return 1


def run():
    here = os.path.dirname(os.path.abspath(__file__))
    work = os.path.join(here, "bench_work")
    fna, panel = bench_data.build(work)
    out_path = os.path.join(work, "bench_out.txt")

    # Mild oversubscription overlaps the Python orchestration with the
    # GIL-free native search (measured ~5% on the 2-core dev box).
    os.environ.setdefault("TNTBLAST_TPU_THREADS",
                          str(2 * (os.cpu_count() or 1)))

    from tntblast_tpu.cli import local_main
    from tntblast_tpu.devhealth import device_health

    base_argv = ["-i", panel, "-d", fna, "-A", "PCR",
                 "-e", "40", "-E", "45", "-l", "2000", "-o", out_path]

    # Warmup input: the first full sequence (same fragment sizes, hence
    # the SAME padded device tile shapes as the timed run) so the native
    # build and every XLA compile happen outside the timed region.
    warm_fna = os.path.join(work, "warm.fna")
    if not os.path.exists(warm_fna):
        with open(fna) as src, open(warm_fna, "w") as dst:
            n_hdr = 0
            for line in src:
                if line.startswith(">"):
                    n_hdr += 1
                    if n_hdr > 1:
                        break
                dst.write(line)

    configs = [("host", [])]
    ok, platform, reason = device_health()
    device_note = f"{platform}: {reason}"
    if ok and platform != "cpu":
        configs.append(("tpu-screen", ["--tpu-screen", "T"]))

    devnull = open(os.devnull, "w")
    results = {}
    with contextlib.redirect_stdout(devnull):
        for name, extra in configs:
            argv = base_argv + extra
            warm = ["-i", panel, "-d", warm_fna, "-A", "PCR", "-e", "40",
                    "-E", "45", "-l", "2000",
                    "-o", os.path.join(work, "warm_out.txt")] + extra
            rc = local_main(warm, stdout=devnull)
            if rc != 0:
                return _fail(f"warmup exit code {rc} ({name})")
            times = []
            runs = 5 if name == "host" else 3
            for _ in range(runs):
                t0 = time.time()
                rc = local_main(argv, stdout=devnull)
                dt = time.time() - t0
                if rc != 0:
                    return _fail(f"engine exit code {rc} ({name})")
                got = _sha256(out_path)
                if got != BENCH_GOLDEN_SHA256:
                    return _fail(
                        f"hit list diverges from reference golden ({name}): "
                        f"sha256 {got[:16]}... != "
                        f"{BENCH_GOLDEN_SHA256[:16]}...")
                times.append(dt)
            results[name] = times

    summary = {name: {
        "median_mbps": round(GENOME_MB / statistics.median(t), 3),
        "best_mbps": round(GENOME_MB / min(t), 3),
        "spread_s": round(max(t) - min(t), 3),
    } for name, t in results.items()}

    best_path = max(summary, key=lambda n: summary[n]["median_mbps"])
    mbps = summary[best_path]["median_mbps"]
    print(json.dumps({
        "metric": "pcr_search_throughput",
        "value": mbps,
        "unit": "Mbases/s",
        "vs_baseline": round(mbps / REF_MBPS_32CORE, 4),
        "path": best_path,
        "device": device_note,
        "paths": summary,
    }))
    return 0


if __name__ == "__main__":
    rc = run()
    sys.stdout.flush()
    sys.stderr.flush()
    # A wedged-link health probe leaves a daemon thread blocked inside the
    # PJRT client; interpreter teardown then aborts in native code.  The
    # JSON line is already out — skip teardown.
    os._exit(rc)
