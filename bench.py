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

Methodology (VERDICT r2 #8, r3 #2):
  * correctness gate: the hit list must be BYTE-IDENTICAL to the
    recorded reference output (sha256 in BENCH_GOLDEN_SHA256, generated
    from tntblast v2.77 on this exact config) — not a count floor;
  * median of 5 timed runs, with min/max spread reported;
  * the device path is measured whenever the tunnel is healthy; the
    health probe is RETRIED around the host measurement because the link
    wedges intermittently (minutes at a time, BASELINE.md) — one failed
    probe never zeroes out the round;
  * a device-only microbenchmark (fragment batches through the panel
    step with a one-element readback) records the chip's screening
    throughput independent of bulk device-to-host transfers.
"""

import contextlib
import hashlib
import io
import json
import os
import statistics
import sys
import time

# The axon (tunneled-TPU) PJRT client runs background RPC machinery that
# costs ~45% of HOST-path throughput when initialized in-process
# (measured 9.0 vs 16.5 Mb/s, spread 0.03 s).  Pinning the platform env
# before any jax import keeps the host measurement clean; the device
# probe and the --tpu-screen path still reach the chip (the site hook
# registers the axon backend regardless — measured identical micro/e2e
# numbers under the pin).  FORCED, not setdefault: the driver's
# environment carries JAX_PLATFORMS=axon.
os.environ["JAX_PLATFORMS"] = "cpu"

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


def _device_microbench(fna, panel_path):
    """Chip-side screening throughput, independent of bulk d2h transfers.

    Runs the real bench panel over real bench fragments: N panel-step
    executions synced by a one-element readback.  Reports Mbases/s of
    fragment data screened on the device (seeding + per-slot exact DP at
    both screening temperatures), plus windows/s."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tntblast_tpu.engine import make_melt_engine
    from tntblast_tpu.io.fastx import open_database, seq_len_increment
    from tntblast_tpu.model import (
        expand_degenerate_signatures, read_input_file)
    from tntblast_tpu.options import Options
    from tntblast_tpu.parallel.panel import FragmentPanelManager

    opt = Options()
    opt.parse(["-i", panel_path, "-d", fna, "-A", "PCR", "-e", "40",
               "-E", "45", "-l", "2000", "-o", os.devnull])
    opt.sig_list = read_input_file(opt.input_filename, opt.ignore_probe,
                                   False)
    opt.sig_list = expand_degenerate_signatures(opt.sig_list,
                                                opt.degen_rescale_ct)
    engine = make_melt_engine(opt, n_threads=1)
    db = open_database(opt.dbase_filename)
    mgr = FragmentPanelManager(opt, engine)

    mpl = opt.max_product_length() + 2
    frags = []
    for tgt in range(db.size()):
        tlen = db.approx_seq_len(tgt)
        delta = seq_len_increment(tlen, opt.fragment_target_threshold)[0]
        start, stop = 0, delta
        while True:
            _, seq_codes = db.read(tgt, start, stop + mpl)
            frags.append(seq_codes)
            if stop == tlen - 1:
                break
            start, stop = stop + 1, min(stop + delta, tlen - 1)
        if len(frags) >= mgr.batch:
            break
    frags = frags[:mgr.batch]
    batch_bases = sum(len(f) for f in frags)

    g = mgr.groups[0]
    dp = g.device_panel(mgr._tile_len(max(len(f) for f in frags)))
    payload = tuple(jnp.asarray(a) for a in dp._pack_host(frags))
    step = dp._step(len(frags), False)

    def sync(out):
        return np.asarray(out[0][:1])

    out = step(*payload, *dp.args)          # compile + warm
    sync(out)
    header = np.asarray(out[0])
    n_kept = int(header[0])
    # per-fragment candidate counts live after [n_kept, overflow(n),
    # reserved(num_os)] in the packed header (device_search.py)
    nf = len(frags)
    n_cand = int(header[1 + nf + dp.config.num_os:
                        1 + 2 * nf + dp.config.num_os].sum())
    reps = 6
    t0 = time.time()
    for _ in range(reps):
        out = step(*payload, *dp.args)
    sync(out)
    dt = (time.time() - t0) / reps

    # Per-chip utilization (VERDICT r4 #10): DP cell-condition updates
    # per second against a VPU speed-of-light estimate.  Each candidate
    # window runs a (<= wq_max) x (oligo+8) x nc_all cell grid; a cell
    # update is ~12 int32 vector ops (3-state max/relu/subtract chain).
    # v5e VPU peak ~ 4 ops/cycle x 8x128 lanes x 0.94 GHz ~ 3.9e12
    # int32 ops/s -> ~3.2e11 cells/s ceiling.
    cfg = dp.config
    nc_all = cfg.num_cond + (1 if dp.eval_on else 0)
    cells = n_cand * cfg.wq_max * (cfg.wq_max + 8) * nc_all
    cells_per_s = cells / dt
    return {
        "mbases_per_s": round(batch_bases / dt / 1e6, 2),
        "batch_ms": round(dt * 1e3, 1),
        "n_frags": len(frags),
        "kept_seeds": n_kept,
        "candidates": n_cand,
        "dp_cells_per_s": float(f"{cells_per_s:.3g}"),
        "vpu_cell_ceiling": 3.2e11,
        "utilization_pct": round(100 * cells_per_s / 3.2e11, 3),
    }


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

    devnull = open(os.devnull, "w")
    results = {}
    notes = {}
    probes = []

    def probe():
        ok, platform, reason = device_health(reprobe=True)
        probes.append(f"{platform}: {reason}")
        return ok and platform != "cpu"

    def measure(name, extra, runs):
        argv = base_argv + extra
        warm = ["-i", panel, "-d", warm_fna, "-A", "PCR", "-e", "40",
                "-E", "45", "-l", "2000",
                "-o", os.path.join(work, "warm_out.txt")] + extra
        err = io.StringIO()
        with contextlib.redirect_stdout(devnull):
            with contextlib.redirect_stderr(err):
                rc = local_main(warm, stdout=devnull)
        if rc != 0:
            raise RuntimeError(f"warmup exit code {rc} ({name})")
        times = []
        for _ in range(runs):
            err = io.StringIO()
            t0 = time.time()
            with contextlib.redirect_stdout(devnull):
                with contextlib.redirect_stderr(err):
                    rc = local_main(argv, stdout=devnull)
            dt = time.time() - t0
            if rc != 0:
                raise RuntimeError(f"engine exit code {rc} ({name})")
            got = _sha256(out_path)
            if got != BENCH_GOLDEN_SHA256:
                raise RuntimeError(
                    f"hit list diverges from reference golden ({name}): "
                    f"sha256 {got[:16]}... != {BENCH_GOLDEN_SHA256[:16]}...")
            times.append(dt)
            text = err.getvalue()
            if "device" in text.lower() and "warning" in text.lower():
                notes[name] = text.strip().splitlines()[-1]
        results[name] = times

    try:
        measure("host", [], 5)
    except RuntimeError as e:
        return _fail(str(e))

    # Device path: probe (retrying once after the host run — the tunnel
    # wedges intermittently) and measure when healthy.
    device_ok = probe() or probe()
    if device_ok:
        try:
            measure("tpu-screen", ["--tpu-screen", "T"], 3)
        except RuntimeError as e:
            notes["tpu-screen"] = str(e)
        try:
            results["_micro"] = _device_microbench(fna, panel)
        except Exception as e:   # noqa: BLE001 — microbench is best-effort
            notes["microbench"] = f"{type(e).__name__}: {e}"

    micro = results.pop("_micro", None)
    summary = {name: {
        "median_mbps": round(GENOME_MB / statistics.median(t), 3),
        "best_mbps": round(GENOME_MB / min(t), 3),
        "spread_s": round(max(t) - min(t), 3),
    } for name, t in results.items()}

    best_path = max(summary, key=lambda n: summary[n]["median_mbps"])
    mbps = summary[best_path]["median_mbps"]
    out = {
        "metric": "pcr_search_throughput",
        "value": mbps,
        "unit": "Mbases/s",
        "vs_baseline": round(mbps / REF_MBPS_32CORE, 4),
        "path": best_path,
        "device": probes[-1] if probes else "not probed",
        "paths": summary,
        # VERDICT r5 #3 policy: the engine supports --tpu-screen A
        # (device path auto-enabled when the health gate passes), but
        # the headline stays the FASTER measured path — defaulting a
        # measured-slower path would regress every default run; both
        # medians are recorded above either way.
        "device_policy": "auto available (--tpu-screen A); headline="
                         "faster measured path",
    }
    if micro:
        out["device_screen_microbench"] = micro
    if notes:
        out["notes"] = notes
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    rc = run()
    sys.stdout.flush()
    sys.stderr.flush()
    # A wedged-link health probe leaves a daemon thread blocked inside the
    # PJRT client; interpreter teardown then aborts in native code.  The
    # JSON line is already out — skip teardown.
    os._exit(rc)
