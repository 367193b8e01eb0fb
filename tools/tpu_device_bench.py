"""Device-path benchmark suite, run opportunistically on a healthy link.

Phases (each emits its own JSON line immediately, so a mid-phase tunnel
wedge still leaves earlier results in the watch log):

  1. e2e      — full engine runs with --tpu-screen T on the bench config,
                byte-equality-gated against the reference golden
  2. micro    — panel-step repetitions with a one-element readback: the
                chip-side seed+screen+eval throughput
  3. staged   — stage decomposition of the device step:
                V1 seed+compact, V2 +slot-major sort, V3 full step with
                the eval channel off, V4 full step (the production
                program) — V3/V4 isolate the screen DP vs eval cost

All timings sync via small device-to-host readbacks (block_until_ready
does not synchronize on this backend, BASELINE.md).
"""

import contextlib
import hashlib
import io
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench_data  # noqa: E402

GOLDEN_SHA = "4394383a49dbcbe751377f977fa7509c124c243350c755a72bbf876156d66b05"
GENOME_MB = (bench_data.NSEQ * bench_data.SEQLEN) / 1e6


def emit(obj):
    obj["t"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(obj))
    sys.stdout.flush()


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def build_frag_batch(fna, panel_path, eval_on=True):
    """(mgr, payload_args, frags, batch_bases) for the bench fragments."""
    import numpy as np
    import jax.numpy as jnp
    from tntblast_tpu.engine import make_melt_engine
    from tntblast_tpu.io.fastx import open_database, seq_len_increment
    from tntblast_tpu.model import (
        expand_degenerate_signatures, read_input_file)
    from tntblast_tpu.options import Options
    from tntblast_tpu.parallel.panel import FragmentPanelManager

    os.environ["TNTBLAST_TPU_DEV_EVAL"] = "1" if eval_on else "0"
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
    return mgr, frags, sum(len(f) for f in frags)


def timed_reps(fn, sync, reps=6):
    out = fn()
    sync(out)                       # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps, out


def phase_e2e(fna, panel, work):
    from tntblast_tpu.cli import local_main
    out_path = os.path.join(work, "dev_bench_out.txt")
    warm_fna = os.path.join(work, "warm.fna")
    argv = ["-i", panel, "-d", fna, "-A", "PCR", "-e", "40", "-E", "45",
            "-l", "2000", "-o", out_path, "--tpu-screen", "T"]
    warm = ["-i", panel, "-d", warm_fna, "-A", "PCR", "-e", "40",
            "-E", "45", "-l", "2000",
            "-o", os.path.join(work, "warm_out.txt"), "--tpu-screen", "T"]
    devnull = open(os.devnull, "w")
    t0 = time.time()
    with contextlib.redirect_stdout(devnull):
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = local_main(warm, stdout=devnull)
    emit({"phase": "e2e_warm", "rc": rc, "s": round(time.time() - t0, 2),
          "stderr": err.getvalue().strip()[-200:]})
    if rc != 0:
        return
    times = []
    for i in range(3):
        err = io.StringIO()
        t0 = time.time()
        with contextlib.redirect_stdout(devnull):
            with contextlib.redirect_stderr(err):
                rc = local_main(argv, stdout=devnull)
        dt = time.time() - t0
        golden = sha256(out_path) == GOLDEN_SHA
        fell_back = "falling back" in err.getvalue() or \
            "disabled" in err.getvalue()
        times.append(dt)
        emit({"phase": "e2e_run", "i": i, "s": round(dt, 3),
              "mbps": round(GENOME_MB / dt, 2), "golden": golden,
              "fell_back": fell_back, "rc": rc,
              "stderr": err.getvalue().strip()[-200:]})
    emit({"phase": "e2e", "median_mbps":
          round(GENOME_MB / statistics.median(times), 3),
          "times": [round(t, 3) for t in times]})


def phase_micro_and_staged(fna, panel):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import functools

    mgr, frags, batch_bases = build_frag_batch(fna, panel, eval_on=True)
    g = mgr.groups[0]
    tile = mgr._tile_len(max(len(f) for f in frags))
    dp = g.device_panel(tile)
    payload = tuple(jnp.asarray(a) for a in dp._pack_host(frags))
    step = dp._step(len(frags), False)

    def sync_first(out):
        return np.asarray(out[0][:1])

    # --- micro: production step -----------------------------------------
    try:
        dt, out = timed_reps(lambda: step(*payload, *dp.args), sync_first)
        emit({"phase": "micro", "batch_ms": round(dt * 1e3, 1),
              "mbases_per_s": round(batch_bases / dt / 1e6, 2),
              "n_frags": len(frags),
              "kept_seeds": int(np.asarray(out[0][0])),
              "tile_len": tile})
    except Exception as e:  # noqa: BLE001
        emit({"phase": "micro", "error": f"{type(e).__name__}: {e}"})
        return

    # --- staged: V1 seed, V2 +sort --------------------------------------
    from tntblast_tpu.parallel.device_search import _seed_fragment

    cfg = dp.config
    n = len(frags)
    seedf = functools.partial(
        _seed_fragment, word_len=cfg.word_len, num_os=cfg.num_os,
        max_words=cfg.max_words, tile_len=cfg.tile_len, cap=cfg.cap,
        s_max=dp.s_max, k_max=dp.k_max)
    ow, w_tab = dp.args[0], dp.args[1]
    L = cfg.tile_len

    def unpack(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c):
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        fr = ((frags_packed[:, :, None] >> shifts[None, None, :]) & 3
              ).reshape(n, L).astype(jnp.uint8)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        fr = jnp.where(pos >= frag_lens[:, None], jnp.uint8(18), fr)
        delta = jnp.zeros((n, L + 1), jnp.int32)
        ones = jnp.ones(nrun_s.shape, jnp.int32)
        delta = delta.at[jnp.arange(n)[:, None],
                         jnp.clip(nrun_s, 0, L)].add(ones)
        delta = delta.at[jnp.arange(n)[:, None],
                         jnp.clip(nrun_e, 0, L)].add(-ones)
        in_n = jnp.cumsum(delta[:, :L], axis=1) > 0
        fr = jnp.where(in_n, jnp.uint8(15), fr)
        fr = jnp.concatenate([fr, jnp.zeros((n, 1), jnp.uint8)], axis=1)
        fr = fr.at[jnp.arange(n)[:, None],
                   jnp.clip(exc_p, 0, L)].set(exc_c)
        return fr[:, :L]

    @jax.jit
    def v1(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c, over):
        fr = unpack(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c)
        slot, p, n_cand, counts, overflow, word, wv = jax.vmap(
            seedf, in_axes=(0, 0, None, None))(fr, frag_lens, ow, w_tab)
        return (slot.sum() + p.sum() + n_cand.sum()
                + counts.sum())[None]

    @jax.jit
    def v2(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c, over):
        fr = unpack(frags_packed, frag_lens, nrun_s, nrun_e, exc_p, exc_c)
        slot, p, n_cand, counts, overflow, word, wv = jax.vmap(
            seedf, in_axes=(0, 0, None, None))(fr, frag_lens, ow, w_tab)
        Bp = n * cfg.cap
        slot_f = slot.reshape(Bp)
        rank = jnp.arange(Bp, dtype=jnp.int32) % cfg.cap
        frag_f = jnp.arange(Bp, dtype=jnp.int32) // cfg.cap
        valid = rank < n_cand[frag_f]
        key = jnp.where(valid, slot_f, cfg.num_os)
        order = jnp.argsort(key, stable=True)
        return (p.reshape(Bp)[order].sum()
                + frag_f[order].sum())[None]

    for name, fn in (("seed_compact", v1), ("plus_sort", v2)):
        try:
            dt, _ = timed_reps(lambda fn=fn: fn(*payload),
                               lambda o: np.asarray(o))
            emit({"phase": "staged", "stage": name,
                  "batch_ms": round(dt * 1e3, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"phase": "staged", "stage": name,
                  "error": f"{type(e).__name__}: {e}"})
            return

    # --- V3: full step, eval channel off ---------------------------------
    try:
        mgr3, frags3, _ = build_frag_batch(fna, panel, eval_on=False)
        dp3 = mgr3.groups[0].device_panel(tile)
        payload3 = tuple(jnp.asarray(a) for a in dp3._pack_host(frags3))
        step3 = dp3._step(len(frags3), False)
        dt, _ = timed_reps(lambda: step3(*payload3, *dp3.args), sync_first)
        emit({"phase": "staged", "stage": "full_no_eval",
              "batch_ms": round(dt * 1e3, 1)})
    except Exception as e:  # noqa: BLE001
        emit({"phase": "staged", "stage": "full_no_eval",
              "error": f"{type(e).__name__}: {e}"})

    # --- V4: the production step again (post-staged, link drift check) ---
    try:
        dt, _ = timed_reps(lambda: step(*payload, *dp.args), sync_first)
        emit({"phase": "staged", "stage": "full_eval",
              "batch_ms": round(dt * 1e3, 1),
              "mbases_per_s": round(batch_bases / dt / 1e6, 2)})
    except Exception as e:  # noqa: BLE001
        emit({"phase": "staged", "stage": "full_eval",
              "error": f"{type(e).__name__}: {e}"})


def main():
    work = os.path.join(HERE, "bench_work")
    fna, panel = bench_data.build(work)
    os.environ.setdefault("TNTBLAST_TPU_THREADS",
                          str(2 * (os.cpu_count() or 1)))
    emit({"phase": "start", "pid": os.getpid()})

    from tntblast_tpu.devhealth import device_health
    ok, platform, reason = device_health()
    emit({"phase": "probe", "ok": ok, "platform": platform,
          "reason": reason})
    if not ok or platform == "cpu":
        os._exit(1)

    try:
        phase_e2e(fna, panel, work)
    except Exception as e:  # noqa: BLE001
        emit({"phase": "e2e", "error": f"{type(e).__name__}: {e}"})
    try:
        phase_micro_and_staged(fna, panel)
    except Exception as e:  # noqa: BLE001
        emit({"phase": "micro", "error": f"{type(e).__name__}: {e}"})
    emit({"phase": "done"})
    os._exit(0)


if __name__ == "__main__":
    main()
