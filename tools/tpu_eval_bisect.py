"""eval_flat sub-stage decomposition at chunk shape (healthy link)."""
import json, os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    from tntblast_tpu.ops import eval_gapless_jax as ej
    rng = np.random.default_rng(0)
    B, wq, wt, NR = 32768, 24, 32, 40
    CHUNKS = 4
    M_rows = jnp.asarray(rng.integers(-1, 60000, (wq, B, wt + 1)).astype(np.int32))
    mg = jnp.asarray(rng.integers(-(1<<29), 1000, B).astype(np.int32))
    tc = jnp.asarray(rng.integers(0, 4, (B, wt)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 4, (B, wq)).astype(np.int32))
    ql = jnp.asarray(np.full(B, 22, np.int32))
    wte = ql + 8
    sl = rng.integers(0, NR, B)
    oh = jnp.asarray((sl[:, None] == np.arange(NR)).astype(np.float32))
    evt = jnp.asarray(rng.standard_normal((NR, wq, 25, 4)).astype(np.float32))
    evl = jnp.asarray(rng.standard_normal((NR, wq + 2)).astype(np.float32))
    const = (1.0, 2.0, 3.0, 4.0)

    @jax.jit
    def full(M_rows, mg, tc, q, ql, wte, oh):
        acc = jnp.float32(0)
        for _ in range(CHUNKS):
            ev = ej.eval_flat(M_rows, mg, tc, q, ql, wte, oh, evt, evl, const)
            acc = acc + ev["dH"].sum() + ev["anchor5"].sum()
        return acc[None]

    # variant without the qstep scan: monkeypatch-free partial = measure pieces
    import types
    src = {}
    def timed(name, fn):
        out = fn(); np.asarray(out)
        t0 = time.time()
        for _ in range(4):
            out = fn()
        np.asarray(out)
        emit({"stage": name, "ms": round((time.time()-t0)/4*1e3, 1)})

    timed("eval_full_4chunks", lambda: full(M_rows, mg, tc, q, ql, wte, oh))

    # pieces: argmax/Mdiag part only
    @jax.jit
    def p_argmax(M_rows, ql, wte):
        acc = jnp.int32(0)
        for _ in range(CHUNKS):
            wqm, Bs, wtp1 = M_rows.shape
            rr = jnp.arange(wqm)[:, None, None]
            jc = jnp.arange(wtp1)[None, None, :]
            Mm = jnp.where((rr < ql[None, :, None]) & (jc <= wte[None, :, None]), M_rows, -1)
            flat = jnp.moveaxis(Mm, 1, 0).reshape(Bs, wqm * wtp1)
            best = jnp.max(flat, axis=1)
            am = jnp.argmax(flat, axis=1)
            acc = acc + best.sum() + am.astype(jnp.int32).sum()
        return acc[None]
    timed("mask_argmax", lambda: p_argmax(M_rows, ql, wte))

    # Mbyr gather loops
    @jax.jit
    def p_mdiag(M_rows, ql, wte):
        acc = jnp.int32(0)
        for _ in range(CHUNKS):
            wqm, Bs, wtp1 = M_rows.shape
            A = jnp.clip(mg % 50, 0, 49)
            cols = []
            for r in range(wqm):
                j_r = A - ql + r + 2
                ok = (j_r >= 0) & (j_r < wtp1) & (r < ql)
                v = jnp.take_along_axis(M_rows[r], jnp.clip(j_r, 0, wtp1 - 1)[:, None], axis=1)[:, 0]
                cols.append(jnp.where(ok, v, -1))
            Mb = jnp.stack(cols, axis=1)
            qs = jnp.arange(wqm)[None, :]
            Md = jnp.take_along_axis(Mb, jnp.clip(ql[:, None] - 1 - qs, 0, wqm - 1), axis=1)
            acc = acc + Md.sum()
        return acc[None]
    timed("mdiag_gathers", lambda: p_mdiag(M_rows, ql, wte))

    # the qstep scan alone (tpair constant-ish)
    @jax.jit
    def p_scan(tc, oh):
        acc = jnp.float32(0)
        hi = jax.lax.Precision.HIGHEST
        for _ in range(CHUNKS):
            tq = jnp.clip(tc[:, :wq], 0, 4)
            tpair = jnp.clip(tq, 0, 4) * 5 + jnp.clip(tq, 0, 4)
            f = jnp.zeros((B,), jnp.float32)
            def qstep(carry, xs):
                dH, = carry
                tp, T_row = xs
                T_eff = jnp.einsum('bs,spk->bpk', oh, T_row, precision=hi)
                ohp = (tp[:, None] == jnp.arange(25)[None, :]).astype(jnp.float32)
                vals = jnp.einsum('bp,bpk->bk', ohp, T_eff, precision=hi)
                return (dH + vals[:, 0],), None
            (dH,), _ = jax.lax.scan(qstep, (f,), (jnp.moveaxis(tpair, 1, 0)[:wq], jnp.moveaxis(evt, 1, 0)))
            acc = acc + dH.sum()
        return acc[None]
    timed("qstep_scan", lambda: p_scan(tc, oh))
    os._exit(0)

main()
