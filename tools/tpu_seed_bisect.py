"""Sub-stage bisection of the device seeding stage on a healthy link."""
import os, sys, time, json, functools
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
import bench_data

def emit(o):
    o["t"] = time.strftime("%H:%M:%S"); print(json.dumps(o)); sys.stdout.flush()

def main():
    import numpy as np, jax, jax.numpy as jnp
    from tools.tpu_device_bench import build_frag_batch
    work = os.path.join(HERE, "bench_work")
    fna, panel = bench_data.build(work)
    mgr, frags, bb = build_frag_batch(fna, panel, eval_on=True)
    g = mgr.groups[0]
    tile = mgr._tile_len(max(len(f) for f in frags))
    dp = g.device_panel(tile)
    payload = tuple(jnp.asarray(a) for a in dp._pack_host(frags))
    cfg = dp.config
    from tntblast_tpu import constants as C
    n = len(frags); L = cfg.tile_len; w = cfg.word_len
    nw_pos = L - w + 1
    cap, num_os, max_words = cfg.cap, cfg.num_os, cfg.max_words
    ow, w_tab = dp.args[0], dp.args[1]
    emit({"cfg": {"tile": L, "cap": cap, "num_os": num_os,
                  "max_words": max_words, "n": n}})

    def unpack(fp, fl, ns, ne, ep, ec):
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        fr = ((fp[:, :, None] >> shifts[None, None, :]) & 3).reshape(n, L).astype(jnp.uint8)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        fr = jnp.where(pos >= fl[:, None], jnp.uint8(C.DB_UNKNOWN), fr)
        delta = jnp.zeros((n, L + 1), jnp.int32)
        ones = jnp.ones(ns.shape, jnp.int32)
        delta = delta.at[jnp.arange(n)[:, None], jnp.clip(ns, 0, L)].add(ones)
        delta = delta.at[jnp.arange(n)[:, None], jnp.clip(ne, 0, L)].add(-ones)
        in_n = jnp.cumsum(delta[:, :L], axis=1) > 0
        fr = jnp.where(in_n, jnp.uint8(C.DB_N), fr)
        fr = jnp.concatenate([fr, jnp.zeros((n, 1), jnp.uint8)], axis=1)
        fr = fr.at[jnp.arange(n)[:, None], jnp.clip(ep, 0, L)].set(ec)
        return fr[:, :L]

    def words_of(fr, fl):
        codes = fr.astype(jnp.int32)
        two_bit = codes & 3
        valid = (codes <= C.DB_MAX_ATGC) & (jnp.arange(L)[None, :] < fl[:, None])
        word = jnp.zeros((n, nw_pos), jnp.int32)
        for k in range(w):
            word = word | (two_bit[:, k:nw_pos + k] << (2 * (w - 1 - k)))
        vc = jnp.cumsum(jnp.concatenate([jnp.zeros((n,1), jnp.int32), valid.astype(jnp.int32)], axis=1), axis=1)
        wv = (vc[:, w:] - vc[:, :-w]) == w
        wv = wv & (jnp.arange(nw_pos)[None, :] < (fl[:, None] - w + 1))
        return word, wv

    @jax.jit
    def s1(fp, fl, ns, ne, ep, ec, ov):
        fr = unpack(fp, fl, ns, ne, ep, ec)
        return fr.astype(jnp.int32).sum()[None]

    @jax.jit
    def s2(fp, fl, ns, ne, ep, ec, ov):
        fr = unpack(fp, fl, ns, ne, ep, ec)
        word, wv = words_of(fr, fl)
        return (word.sum() + wv.sum())[None]

    @jax.jit
    def s3(fp, fl, ns, ne, ep, ec, ov):
        fr = unpack(fp, fl, ns, ne, ep, ec)
        word, wv = words_of(fr, fl)
        a_any = (w_tab != 0).any(axis=1)
        any_m = a_any[word] & wv
        return any_m.sum()[None]

    @jax.jit
    def s4(fp, fl, ns, ne, ep, ec, ov):
        fr = unpack(fp, fl, ns, ne, ep, ec)
        word, wv = words_of(fr, fl)
        a_any = (w_tab != 0).any(axis=1)
        any_m = a_any[word] & wv
        def one(am):
            (widx,) = jnp.nonzero(am, size=cap, fill_value=nw_pos)
            return widx.sum()
        return jax.vmap(one)(any_m).sum()[None]

    @jax.jit
    def s5(fp, fl, ns, ne, ep, ec, ov):
        # + mask gather + slot/k lane extraction (no sort)
        fr = unpack(fp, fl, ns, ne, ep, ec)
        word, wv = words_of(fr, fl)
        a_any = (w_tab != 0).any(axis=1)
        any_m = a_any[word] & wv
        def one(wrd, am):
            (widx,) = jnp.nonzero(am, size=cap, fill_value=nw_pos)
            w_ok = widx < nw_pos
            wsel = jnp.clip(widx, 0, nw_pos - 1)
            masks = jnp.where(w_ok[:, None], w_tab[wrd[wsel]], 0)
            occ = (masks != 0)
            m0 = jnp.zeros(cap, jnp.int32)
            m1 = jnp.zeros(cap, jnp.int32)
            for s_ in range(num_os):
                b = occ[:, s_].astype(jnp.int32)
                if s_ < 32:
                    m0 = m0 | (b << s_)
                else:
                    m1 = m1 | (b << (s_ - 32))
            acc = jnp.zeros(cap, jnp.int32)
            for _ in range(dp.s_max):
                nz0 = m0 != 0
                b0 = m0 & -m0
                acc = acc + jnp.where(nz0, jax.lax.population_count(b0 - 1), 0)
                m0 = jnp.where(nz0, m0 & (m0 - 1), m0)
            return acc.sum() + m1.sum()
        return jax.vmap(one)(word, any_m).sum()[None]

    from tntblast_tpu.parallel.device_search import _seed_fragment
    seedf = functools.partial(_seed_fragment, word_len=w, num_os=num_os,
                              max_words=max_words, tile_len=L, cap=cap,
                              s_max=dp.s_max, k_max=dp.k_max)
    @jax.jit
    def s6(fp, fl, ns, ne, ep, ec, ov):
        fr = unpack(fp, fl, ns, ne, ep, ec)
        out = jax.vmap(seedf, in_axes=(0, 0, None, None))(fr, fl, ow, w_tab)
        return (out[0].sum() + out[1].sum() + out[3].sum())[None]

    names = ["unpack", "+words", "+anymatch", "+nonzero1", "+lanes", "full_seed"]
    for name, fn in zip(names, (s1, s2, s3, s4, s5, s6)):
        try:
            out = fn(*payload); np.asarray(out)
            t0 = time.time()
            for _ in range(6):
                out = fn(*payload)
            np.asarray(out)
            emit({"stage": name, "batch_ms": round((time.time()-t0)/6*1e3, 1)})
        except Exception as e:
            emit({"stage": name, "error": f"{type(e).__name__}: {e}"})
    os._exit(0)

if __name__ == "__main__":
    main()
