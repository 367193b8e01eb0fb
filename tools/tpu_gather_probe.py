"""Micro-probe: element gather vs slice gather for window extraction."""
import json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    NL = 8 * 524288
    CH = 32768
    WT = 32
    flat = jnp.asarray(rng.integers(0, 4, NL).astype(np.uint8))
    starts = jnp.asarray(rng.integers(0, NL - WT, 11 * CH).astype(np.int32))

    @jax.jit
    def elem(flat, starts):
        jj = jnp.arange(WT, dtype=jnp.int32)
        acc = jnp.int32(0)
        for c in range(11):
            st = starts[c*CH:(c+1)*CH]
            gidx = st[:, None] + jj[None, :]
            acc = acc + flat[gidx].astype(jnp.int32).sum()
        return acc[None]

    @jax.jit
    def slice_g(flat, starts):
        acc = jnp.int32(0)
        for c in range(11):
            st = starts[c*CH:(c+1)*CH]
            w = jax.vmap(lambda s: jax.lax.dynamic_slice(flat, (s,), (WT,)))(st)
            acc = acc + w.astype(jnp.int32).sum()
        return acc[None]

    @jax.jit
    def slice_g32(flat, starts):
        flat32 = flat.astype(jnp.int32)
        acc = jnp.int32(0)
        for c in range(11):
            st = starts[c*CH:(c+1)*CH]
            w = jax.vmap(lambda s: jax.lax.dynamic_slice(flat32, (s,), (WT,)))(st)
            acc = acc + w.sum()
        return acc[None]

    @jax.jit
    def rollsel(flat, starts):
        # static-roll select chain (5 distinct widths) on (CH, WT)
        acc = jnp.int32(0)
        wts = [20+8, 21+8, 22+8, 24+8, 18+8]
        for c in range(11):
            st = starts[c*CH:(c+1)*CH]
            jj = jnp.arange(WT, dtype=jnp.int32)
            gidx = st[:, None] + jj[None, :]
            w = flat[gidx].astype(jnp.int32)
            fl = jnp.flip(w, axis=1)
            out = fl
            wt_e = 28 + (st % 5)
            for v in wts:
                out = jnp.where((wt_e == v)[:, None],
                                jnp.roll(fl, -(WT - v), axis=1), out)
            acc = acc + out.sum()
        return acc[None]

    import numpy as np
    for name, fn in (("elem_gather", elem), ("slice_gather_u8", slice_g),
                     ("slice_gather_i32", slice_g32), ("roll_select", rollsel)):
        out = fn(flat, starts); np.asarray(out)
        t0 = time.time()
        for _ in range(6):
            out = fn(flat, starts)
        np.asarray(out)
        emit({"stage": name, "ms": round((time.time()-t0)/6*1e3, 1)})
    os._exit(0)

main()
