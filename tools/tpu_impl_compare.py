"""flat vs aligned screen implementation, production step on-link."""
import json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
import bench_data

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax.numpy as jnp
    work = os.path.join(HERE, "bench_work")
    fna, panel = bench_data.build(work)
    from tools.tpu_device_bench import build_frag_batch, timed_reps
    for impl in ("flat", "aligned"):
        os.environ["TNTBLAST_TPU_SCREEN_IMPL"] = impl
        mgr, frags, bb = build_frag_batch(fna, panel, eval_on=True)
        g = mgr.groups[0]
        tile = mgr._tile_len(max(len(f) for f in frags))
        dp = g.device_panel(tile)
        assert dp.screen_impl == impl, dp.screen_impl
        payload = tuple(jnp.asarray(a) for a in dp._pack_host(frags))
        step = dp._step(len(frags), False)
        t0 = time.time()
        try:
            dt, out = timed_reps(lambda: step(*payload, *dp.args),
                                 lambda o: np.asarray(o[0][:1]))
            emit({"impl": impl, "batch_ms": round(dt * 1e3, 1),
                  "mbases_per_s": round(bb / dt / 1e6, 2),
                  "kept": int(np.asarray(out[0][0])),
                  "total_incl_compile_s": round(time.time() - t0, 1)})
        except Exception as e:
            emit({"impl": impl, "error": f"{type(e).__name__}: {e}"})
    os._exit(0)

main()
