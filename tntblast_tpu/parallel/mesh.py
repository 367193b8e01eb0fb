"""Multi-chip fragment search over a `jax.sharding.Mesh`.

The reference scales by handing (target, fragment) work items to OpenMP
threads or MPI workers (reference tntblast_local.cpp:318-324,
tntblast_master.cpp:429-511 — "database segmentation").  The TPU-native
equivalent is SPMD data parallelism over the fragment axis:

  * database fragments are the sharded batch axis (PartitionSpec("data")),
  * the oligo panel, thermodynamic score tables and thresholds are
    replicated (PartitionSpec()),
  * each device runs the full-fragment search step
    (parallel/device_search.py) on its local fragments,
  * candidate records are merged with one `all_gather` over ICI and seed
    statistics with a `psum` — the collective replacements for the
    reference's chunked `SIGNATURE_RESULTS` MPI gather
    (tntblast_master.cpp:760-849) and `STATUS_UPDATE` accumulation.

Host-side exact re-scoring / pairing stays on the coordinator host exactly
like the reference master's reduce phase; the all-gathered fixed-layout
candidate arrays are the fixed-shape analogue of the hybrid_sig X-macro
records (hybrid_sig.h:121-164).
"""

import functools

import numpy as np

from tntblast_tpu.jaxconf import configure as _jaxconf
_jaxconf()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tntblast_tpu import constants as C
from tntblast_tpu.parallel.device_search import (
    DevicePanel, PanelConfig, fragment_step_core)


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def build_sharded_step(mesh, cfg: PanelConfig, axis_name="data"):
    """jit-compiled SPMD step: (n_frags, tile_len) fragments sharded over
    the mesh; returns replicated, fragment-major candidate arrays.

    n_frags must be a multiple of mesh size (host pads with empty
    fragments — frag_len 0 produces zero seeds, so padding is inert).
    """
    step = functools.partial(
        fragment_step_core,
        word_len=cfg.word_len, num_os=cfg.num_os, max_words=cfg.max_words,
        wq_max=cfg.wq_max, wt=cfg.wt, tile_len=cfg.tile_len, cap=cfg.cap,
        num_cond=cfg.num_cond, kcap=cfg.kcap)

    def local_shard(frags, frag_lens, ow, on, tables, olen, om, thr):
        # vmap over this device's fragment shard
        outs = jax.vmap(
            lambda fc, fl: step(fc, fl, ow, on, tables, olen, om, thr)
        )(frags, frag_lens)
        # merge: candidate records ride ICI once per batch; totals via psum
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True),
            outs)
        total_counts = jax.lax.psum(outs[6].sum(axis=0), axis_name)
        return gathered + (total_counts,)

    n_out = 12
    sharded = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name),
                  P(), P(), P(), P(), P(), P()),
        out_specs=tuple(P() for _ in range(n_out)),
        # the DP scan's carry-init constants are unvarying on the data
        # axis by construction; skip the varying-manual-axes check
        check_vma=False)
    return jax.jit(sharded)


class MeshPanel(DevicePanel):
    """DevicePanel that fans a batch of fragments out across a device mesh.

    The panel (oligo words/codes/thresholds/tables) is packed once and
    replicated; `run_fragments` shards the fragment batch, runs the SPMD
    step, and returns per-fragment host dicts in submission order — the
    same contract as DevicePanel.run_fragment, batched.
    """

    def __init__(self, panel, config, dg_tables, thresholds, mesh=None,
                 axis_name="data"):
        super().__init__(panel, config, dg_tables, thresholds)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        self.n_dev = self.mesh.devices.size
        self._step = build_sharded_step(self.mesh, config, axis_name)
        self._data_sharding = NamedSharding(self.mesh, P(axis_name))
        self._repl_sharding = NamedSharding(self.mesh, P())
        self._args_d = None   # replicated panel args, device_put once

    def submit_fragments(self, frag_code_list):
        """Enqueue the sharded step for a batch of fragments (async);
        resolve with `resolve_fragments`."""
        cfg = self.config
        n = len(frag_code_list)
        n_pad = -(-n // self.n_dev) * self.n_dev
        frags = np.full((n_pad, cfg.tile_len), C.DB_UNKNOWN, dtype=np.uint8)
        lens = np.zeros(n_pad, dtype=np.int32)
        for i, fc in enumerate(frag_code_list):
            if len(fc) > cfg.tile_len:
                raise ValueError("fragment exceeds tile_len")
            frags[i, :len(fc)] = fc
            lens[i] = len(fc)

        frags_d = jax.device_put(frags, self._data_sharding)
        lens_d = jax.device_put(lens, self._data_sharding)
        if self._args_d is None:
            self._args_d = tuple(jax.device_put(a, self._repl_sharding)
                                 for a in self.args)
        return n, self._step(frags_d, lens_d, *self._args_d)

    def resolve_fragments(self, pending):
        """Fast resolve: kept-seed list + counts only (device_search
        DevicePanel.resolve_fragments contract)."""
        n, out = pending
        cfg = self.config
        os_k, p_k, kmin_k, n_kept, counts = (
            np.asarray(out[7]), np.asarray(out[8]), np.asarray(out[9]),
            np.asarray(out[10]), np.asarray(out[6]))
        results = []
        for i in range(n):
            m = int(n_kept[i])
            k = min(m, cfg.kcap)
            ci = counts[i][:self.n_real]
            results.append({
                "os_k": os_k[i][:k], "p_k": p_k[i][:k],
                "kmin_k": kmin_k[i][:k],
                "counts": ci, "n_kept": m,
                "overflow": bool(ci.sum() > cfg.cap or m > cfg.kcap),
            })
        return results

    def resolve_fragments_full(self, pending):
        """Full per-candidate resolve (tests / debugging)."""
        n, out = pending
        (os_idx, p, kmin, keep, needs_host, valid,
         counts) = map(np.asarray, out[:7])
        results = []
        for i in range(n):
            m = int(valid[i].sum())
            ci = counts[i][:self.n_real]
            results.append({
                "os_idx": os_idx[i][:m], "p": p[i][:m], "kmin": kmin[i][:m],
                "keep": keep[i][:m], "needs_host": needs_host[i][:m],
                "counts": ci,
                "overflow": bool(ci.sum() > m),
            })
        return results

    def run_fragments(self, frag_code_list):
        return self.resolve_fragments_full(
            self.submit_fragments(frag_code_list))
