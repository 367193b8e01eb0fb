"""Variant probes: isolate the Pallas kernel's slow part."""
import functools, json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tntblast_tpu.ops.pallas_screen import _shift_down, _prefix_sum, _prefix_max
    NEG = -(1 << 29)
    BB, wq_max, wt_max, nc_all = 512, 24, 32, 3
    n_blocks = 280

    def mk_kernel(n_sel):
        def kern(meta_ref, ptb_ref, best_ref):
            b = pl.program_id(0)
            ql = meta_ref[b, 1]; wt_e = meta_ref[b, 2]
            relu = lambda x: jnp.maximum(x, 0)
            ptb = ptb_ref[0]
            col_ok = (jax.lax.broadcasted_iota(jnp.int32, (wt_max, BB), 0) < wt_e)
            masks = [ptb == v for v in range(n_sel)] if n_sel else None
            neg1 = jnp.full((wt_max, BB), -1, jnp.int32)
            prevM = [neg1]*nc_all; prevIq = [neg1]*nc_all; prevIt = [neg1]*nc_all
            best = [jnp.full((1, BB), -1, jnp.int32)]*nc_all
            for r in range(wq_max):
                rv = r < ql
                newM=[]; newIq=[]; newIt=[]
                for c in range(nc_all):
                    if n_sel:
                        def esel(k):
                            acc = jnp.zeros((wt_max, BB), jnp.int32)
                            for v in range(n_sel):
                                acc = jnp.where(masks[v], (v*7919+k*31) % 60000 - 30000, acc)
                            return acc
                        dgmm=esel(0); dgmq=esel(1); dgmt=esel(2)
                        dgqi=esel(3); dgqe=esel(4); dgti=esel(5); dgte=esel(6)
                    else:
                        dgmm=dgmq=dgmt=dgqi=dgqe=dgti=dgte=jnp.full((wt_max,BB), 1234, jnp.int32)
                    pM=_shift_down(prevM[c],0,-1); pIq=_shift_down(prevIq[c],0,-1); pIt=_shift_down(prevIt[c],0,-1)
                    m = jnp.maximum(jnp.maximum(relu(pM)-dgmm, relu(pIq)-dgmq), relu(pIt)-dgmt)
                    it = jnp.maximum(relu(prevM[c])-dgti, relu(prevIt[c])-dgte)
                    a = jnp.maximum(relu(_shift_down(m,0,-1))-dgqi, -dgqe)
                    ssum = _prefix_sum(dgqe, axis=0)
                    iq = _prefix_max(a+ssum, axis=0) - ssum
                    rb = jnp.max(jnp.where(col_ok, m, -1), axis=0, keepdims=True)
                    best[c] = jnp.where(rv, jnp.maximum(best[c], rb), best[c])
                    newM.append(m); newIq.append(iq); newIt.append(it)
                prevM, prevIq, prevIt = newM, newIq, newIt
            for c in range(nc_all):
                best_ref[0, c] = best[c][0]
        return kern

    rng = np.random.default_rng(0)
    meta = np.zeros((n_blocks, 4), np.int32)
    meta[:, 1] = 22; meta[:, 2] = 30; meta[:, 3] = 1
    meta = jnp.asarray(meta)
    ptb = jnp.asarray(rng.integers(0, 30, (n_blocks, wt_max, BB)).astype(np.int32))

    for name, n_sel in (("const_energy", 0), ("sel5", 5), ("sel30", 30)):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, wt_max, BB), lambda b, m: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, nc_all, BB), lambda b, m: (b, 0, 0),
                                    memory_space=pltpu.VMEM)])
        f = pl.pallas_call(mk_kernel(n_sel), grid_spec=gs,
                           out_shape=[jax.ShapeDtypeStruct((n_blocks, nc_all, BB), jnp.int32)])
        t0 = time.time()
        (out,) = f(meta, ptb); np.asarray(out[:1, :1])
        emit({"variant": name, "compile_s": round(time.time()-t0, 1)})
        t0 = time.time()
        for _ in range(3):
            (out,) = f(meta, ptb)
        np.asarray(out[:1, :1])
        emit({"variant": name, "steady_ms": round((time.time()-t0)/3*1e3, 1)})
    os._exit(0)

main()
