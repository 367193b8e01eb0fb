"""DP-internals bisection of the flat chunked screen (healthy link)."""
import functools
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
import bench_data  # noqa: E402


def emit(o):
    o["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(o))
    sys.stdout.flush()


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tools.tpu_device_bench import build_frag_batch, timed_reps
    from tntblast_tpu import constants as C
    from tntblast_tpu.parallel.device_search import (
        _seed_fragment, SCREEN_CHUNK, NUM_T5)

    work = os.path.join(HERE, "bench_work")
    fna, panel = bench_data.build(work)
    mgr, frags, bb = build_frag_batch(fna, panel, eval_on=True)
    g = mgr.groups[0]
    tile = mgr._tile_len(max(len(f) for f in frags))
    dp = g.device_panel(tile)
    payload = tuple(jnp.asarray(a) for a in dp._pack_host(frags))
    cfg = dp.config
    n = len(frags)
    L = cfg.tile_len
    cap, num_os = cfg.cap, cfg.num_os
    wq_max = cfg.wq_max
    wt_max = wq_max + 2 * C.NUM_FLANK_BASE
    ow, w_tab = dp.args[0], dp.args[1]
    seedf = functools.partial(
        _seed_fragment, word_len=cfg.word_len, num_os=num_os,
        max_words=cfg.max_words, tile_len=L, cap=cap,
        s_max=dp.s_max, k_max=dp.k_max)
    slot_meta = dp.slot_meta
    n_real = len(slot_meta)
    ol_np = [int(m[0]) for m in slot_meta]
    minus_np = [bool(m[1]) for m in slot_meta]
    CH = min(SCREEN_CHUNK, n * cap)
    n_chunks = -(-(n * cap) // CH)
    emit({"cfg": {"CH": CH, "n_chunks": n_chunks, "wq_max": wq_max,
                  "wt_max": wt_max, "num_os": num_os}})

    def unpack_seed_sort(fp, fl, ns, ne, ep, ec):
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        fr = ((fp[:, :, None] >> shifts[None, None, :]) & 3
              ).reshape(n, L).astype(jnp.uint8)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        fr = jnp.where(pos >= fl[:, None], jnp.uint8(C.DB_UNKNOWN), fr)
        delta = jnp.zeros((n, L + 1), jnp.int32)
        ones = jnp.ones(ns.shape, jnp.int32)
        delta = delta.at[jnp.arange(n)[:, None],
                         jnp.clip(ns, 0, L)].add(ones)
        delta = delta.at[jnp.arange(n)[:, None],
                         jnp.clip(ne, 0, L)].add(-ones)
        in_n = jnp.cumsum(delta[:, :L], axis=1) > 0
        fr = jnp.where(in_n, jnp.uint8(C.DB_N), fr)
        fr = jnp.concatenate([fr, jnp.zeros((n, 1), jnp.uint8)], axis=1)
        fr = fr.at[jnp.arange(n)[:, None], jnp.clip(ep, 0, L)].set(ec)
        fr = fr[:, :L]
        slot, p, n_cand, counts, overflow, word, wv = jax.vmap(
            seedf, in_axes=(0, 0, None, None))(fr, fl, ow, w_tab)
        Bp = n * cap
        slot_f = slot.reshape(Bp)
        p_f = p.reshape(Bp)
        rank = jnp.arange(Bp, dtype=jnp.int32) % cap
        frag_f = jnp.arange(Bp, dtype=jnp.int32) // cap
        valid = rank < jnp.minimum(n_cand, cap)[frag_f]
        key = jnp.where(valid, slot_f, num_os)
        order = jnp.argsort(key, stable=True)
        return (fr, fl, key[order], p_f[order], frag_f[order],
                valid.sum().astype(jnp.int32))

    def win_chunks(fr, fl, sl_s, p_s, f_s, n_pool, do_ohp):
        frags_flat = fr.reshape(-1)
        jj = jnp.arange(wt_max, dtype=jnp.int32)
        acc = jnp.int32(0)
        for c in range(n_chunks):
            sl = sl_s[c * CH:(c + 1) * CH]
            pp = p_s[c * CH:(c + 1) * CH]
            fi = f_s[c * CH:(c + 1) * CH]
            ql = jnp.full(CH, 1, jnp.int32)
            minus = jnp.zeros(CH, bool)
            for s in range(n_real):
                m_s = sl == s
                ql = jnp.where(m_s, ol_np[s], ql)
                if minus_np[s]:
                    minus = minus | m_s
            wt_e = ql + 2 * C.NUM_FLANK_BASE
            start_c = jnp.clip(pp - C.NUM_FLANK_BASE, 0, L - wt_max)
            gidx = fi[:, None] * L + start_c[:, None] + jj[None, :]
            wcod = frags_flat[gidx].astype(jnp.int32)
            if not do_ohp:
                acc = acc + wcod.sum()
                continue
            rev_idx = jnp.clip(wt_e[:, None] - 1 - jj[None, :], 0,
                               wt_max - 1)
            wrev = jnp.take_along_axis(wcod, rev_idx, axis=1)
            melt_m = jnp.where(wrev <= C.DB_MAX_ATGC, 3 - wrev,
                               jnp.where(wrev == C.DB_I, 4, 99))
            melt_p = jnp.where(wcod <= C.DB_I, wcod, 99)
            melt = jnp.where(minus[:, None], melt_m, melt_p)
            col_ok = jj[None, :] < wt_e[:, None]
            tb5 = jnp.where((melt <= 4) & col_ok, melt, 0)
            pt6 = jnp.concatenate(
                [jnp.full((CH, 1), 5, jnp.int32), tb5[:, :-1]], axis=1)
            ptb = pt6 * NUM_T5 + tb5
            ohp = (ptb[:, :, None]
                   == jnp.arange(30)[None, None, :]).astype(jnp.float32)
            acc = acc + jnp.round(ohp.sum()).astype(jnp.int32)
        return acc

    @jax.jit
    def d1(fp, fl, ns, ne, ep, ec, ov):
        out = unpack_seed_sort(fp, fl, ns, ne, ep, ec)
        return (out[2].sum() + out[3].sum())[None]

    @jax.jit
    def d2(fp, fl, ns, ne, ep, ec, ov):
        fr, fl2, sl_s, p_s, f_s, n_pool = unpack_seed_sort(
            fp, fl, ns, ne, ep, ec)
        return win_chunks(fr, fl2, sl_s, p_s, f_s, n_pool, False)[None]

    @jax.jit
    def d3(fp, fl, ns, ne, ep, ec, ov):
        fr, fl2, sl_s, p_s, f_s, n_pool = unpack_seed_sort(
            fp, fl, ns, ne, ep, ec)
        return win_chunks(fr, fl2, sl_s, p_s, f_s, n_pool, True)[None]

    import numpy as np
    for name, fn in (("seed_sort", d1), ("+win_gather", d2),
                     ("+melt_ohp", d3)):
        try:
            dt, _ = timed_reps(lambda fn=fn: fn(*payload),
                               lambda o: np.asarray(o))
            emit({"stage": name, "batch_ms": round(dt * 1e3, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"stage": name, "error": f"{type(e).__name__}: {e}"})
    os._exit(0)


if __name__ == "__main__":
    main()
