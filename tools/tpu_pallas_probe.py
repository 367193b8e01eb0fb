"""Compile + time the Pallas screen kernel at bench shapes on the TPU."""
import json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    from tntblast_tpu.ops.pallas_screen import screen_blocks
    rng = np.random.default_rng(0)
    BB = 512
    wq_max, wt_max, nc_all, n_real = 24, 32, 3, 40
    n_blocks = 280                      # ~143k windows = bench pool + padding
    ts = jnp.asarray(rng.integers(-60000, 60000,
                     (n_real, wq_max, 30, nc_all * 7)).astype(np.int32))
    meta = np.zeros((n_blocks, 4), np.int32)
    for b in range(n_blocks):
        meta[b] = (b % n_real, 20 + (b % 5), 28 + (b % 5), 1 if b % 8 else 0)
    meta = jnp.asarray(meta)
    ptb = jnp.asarray(rng.integers(0, 30, (n_blocks, wt_max, BB)).astype(np.int32))

    t0 = time.time()
    best, mg, mrows = screen_blocks(meta, ptb, ts, n_real=n_real,
                                    wq_max=wq_max, wt_max=wt_max,
                                    nc_all=nc_all, eval_on=True, BB=BB,
                                    interpret=False)
    s = np.asarray(best[:, 0, :1])
    emit({"phase": "compile+first", "s": round(time.time() - t0, 2)})
    t0 = time.time()
    for _ in range(6):
        best, mg, mrows = screen_blocks(meta, ptb, ts, n_real=n_real,
                                        wq_max=wq_max, wt_max=wt_max,
                                        nc_all=nc_all, eval_on=True,
                                        BB=BB, interpret=False)
    np.asarray(best[:, 0, :1])
    emit({"phase": "steady", "ms": round((time.time() - t0) / 6 * 1e3, 1),
          "windows": n_blocks * BB})
    os._exit(0)

main()
