"""Row-step body composition probe: which part of the DP scan costs."""
import json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    B, WT, NR, NC = 32768, 32, 40, 3
    ROWS, CHUNKS = 24, 4
    hi = jax.lax.Precision.HIGHEST
    oh_s = jnp.asarray((rng.integers(0, NR, B)[:, None] == np.arange(NR)).astype(np.float32))
    ptb = rng.integers(0, 30, (B, WT))
    ohp = jnp.asarray((ptb[:, :, None] == np.arange(30)).astype(np.float32))
    TS = jnp.asarray(rng.integers(-9999, 9999, (ROWS, NR, 30, NC*7)).astype(np.float32))
    NEG = -(1 << 29)

    def relu(x): return jnp.maximum(x, 0)

    def mk(step):
        @jax.jit
        def run():
            acc = jnp.int32(0)
            for c in range(CHUNKS):
                neg1 = jnp.full((NC, B, WT + 1), -1, jnp.int32)
                init = (neg1, neg1, neg1, jnp.full((NC, B), -1, jnp.int32))
                (_, _, _, best), _ = jax.lax.scan(step, init, TS)
                acc = acc + best.sum()
            return acc[None]
        return run

    def step_teff(carry, ts_row):
        prevM, prevIq, prevIt, best = carry
        T_eff = jnp.einsum('bs,svk->bvk', oh_s, ts_row, precision=hi)
        best = jnp.maximum(best, jnp.round(T_eff[:, 0, :NC].T).astype(jnp.int32))
        return (prevM, prevIq, prevIt, best), None

    def step_er(carry, ts_row):
        prevM, prevIq, prevIt, best = carry
        T_eff = jnp.einsum('bs,svk->bvk', oh_s, ts_row, precision=hi)
        er = jnp.einsum('bjv,bvk->bjk', ohp, T_eff, precision=hi)
        best = jnp.maximum(best, jnp.round(er[:, 0, :NC].T).astype(jnp.int32))
        return (prevM, prevIq, prevIt, best), None

    def step_full(carry, ts_row):
        prevM, prevIq, prevIt, best = carry
        T_eff = jnp.einsum('bs,svk->bvk', oh_s, ts_row, precision=hi)
        er = jnp.einsum('bjv,bvk->bjk', ohp, T_eff, precision=hi)
        e = jnp.round(er).astype(jnp.int32).reshape(B, WT, NC, 7)
        e = jnp.moveaxis(e, 2, 0)
        dgmm, dgmq, dgmt = e[..., 0], e[..., 1], e[..., 2]
        dgqi, dgqe = e[..., 3], e[..., 4]
        dgti, dgte = e[..., 5], e[..., 6]
        m = jnp.maximum(jnp.maximum(relu(prevM[..., :-1]) - dgmm,
                                    relu(prevIq[..., :-1]) - dgmq),
                        relu(prevIt[..., :-1]) - dgmt)
        it = jnp.maximum(relu(prevM[..., 1:]) - dgti,
                         relu(prevIt[..., 1:]) - dgte)
        m_shift = jnp.concatenate([jnp.full((NC, B, 1), -1, jnp.int32), m[..., :-1]], axis=2)
        a = jnp.maximum(relu(m_shift) - dgqi, -dgqe)
        ssum = jnp.cumsum(dgqe, axis=2)
        iq = jax.lax.cummax(a + ssum, axis=2) - ssum
        best = jnp.maximum(best, jnp.max(m, axis=2))
        z = jnp.full((NC, B, 1), -1, jnp.int32)
        return (jnp.concatenate([z, m], 2), jnp.concatenate([z, iq], 2),
                jnp.concatenate([z, it], 2), best), None

    # variant: er via int8-pair decomposition on the MXU
    TS8 = TS
    def step_full_elemonly(carry, ts_row):
        prevM, prevIq, prevIt, best = carry
        # constant energies (no einsums): isolates the elementwise part
        e = jnp.broadcast_to(jnp.round(ts_row[0, 0, :NC*7]).astype(jnp.int32).reshape(NC, 1, 1, 7),
                             (NC, B, WT, 7))
        dgmm, dgmq, dgmt = e[..., 0], e[..., 1], e[..., 2]
        dgqi, dgqe = e[..., 3], e[..., 4]
        dgti, dgte = e[..., 5], e[..., 6]
        m = jnp.maximum(jnp.maximum(relu(prevM[..., :-1]) - dgmm,
                                    relu(prevIq[..., :-1]) - dgmq),
                        relu(prevIt[..., :-1]) - dgmt)
        it = jnp.maximum(relu(prevM[..., 1:]) - dgti,
                         relu(prevIt[..., 1:]) - dgte)
        m_shift = jnp.concatenate([jnp.full((NC, B, 1), -1, jnp.int32), m[..., :-1]], axis=2)
        a = jnp.maximum(relu(m_shift) - dgqi, -dgqe)
        ssum = jnp.cumsum(dgqe, axis=2)
        iq = jax.lax.cummax(a + ssum, axis=2) - ssum
        best = jnp.maximum(best, jnp.max(m, axis=2))
        z = jnp.full((NC, B, 1), -1, jnp.int32)
        return (jnp.concatenate([z, m], 2), jnp.concatenate([z, iq], 2),
                jnp.concatenate([z, it], 2), best), None

    for name, st in (("teff_only", step_teff), ("plus_er", step_er),
                     ("elem_only", step_full_elemonly), ("full", step_full)):
        fn = mk(st)
        out = fn(); np.asarray(out)
        t0 = time.time()
        for _ in range(6):
            out = fn()
        np.asarray(out)
        emit({"stage": name, "ms": round((time.time()-t0)/6*1e3, 1)})
    os._exit(0)

main()
