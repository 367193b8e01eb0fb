"""Device screening service: candidate windows -> conservative verdicts.

Sits between the native fragment search and the Pallas screening kernel
(ops/pallas_screen.py):

  1. per fragment, the native engine exports each slot's candidate
     windows (tnt_frag_candidates — the exact seed enumeration the
     search will use),
  2. the kernel scores them (bit-exact DP max score) at each screening
     temperature in ONE device call per (fragment, temperature) — calls
     are enqueued asynchronously and only synchronized when the
     fragment's search is about to run, so device latency (~30 ms fixed
     per call on the tunneled runtime) overlaps host work,
  3. provably hit-free candidates (screen.py soundness argument: the DP
     score bound implies the exact Tm/dG filter must fail) become stub
     cache entries in the native search (tnt_frag_set_verdicts), which
     skips their exact evaluation.

Screening never changes results — a dropped window is one the filter
cascade provably rejects; everything else is evaluated exactly.
"""

import numpy as np

from tntblast_tpu import constants as C
from tntblast_tpu.screen import TpuScreen
from tntblast_tpu.parallel.panel import collect_slots
from tntblast_tpu.ops import pallas_screen as ps


class _Slot:
    __slots__ = ("key", "oligo", "codes", "minus", "filt", "conc",
                 "min_scores")

    def __init__(self, key, spec):
        self.key = key
        self.oligo = spec["oligo"]
        self.codes = C.ASCII_TO_MELT[
            np.frombuffer(spec["oligo"].encode(), np.uint8)]
        self.minus = spec["minus"]
        self.filt = spec["filt"]
        self.conc = spec["conc"]
        self.min_scores = {}       # tag ("tm"/"dg") -> (temp, min score)


class FragmentScreen:
    """Pending device verdicts for one fragment."""

    def __init__(self, service, frag, per_slot, outs):
        self.service = service
        self.frag = frag
        self.per_slot = per_slot   # [(slot, starts, elig_idx, chunk_lo)]
        self.outs = outs           # temp -> device array (chunks, CH, 1)

    def resolve(self):
        """Synchronize the device results and attach verdicts."""
        svc = self.service
        scores = {t: np.asarray(o).reshape(-1, ps.CH)
                  for t, o in self.outs.items()}
        for slot, starts, elig_idx, lo in self.per_slot:
            n = len(elig_idx)
            if n == 0:
                continue
            flags = np.zeros(n, dtype=np.uint8)
            for tag, (temp, ms) in slot.min_scores.items():
                sc = scores[temp].reshape(-1)[lo:lo + n]
                failed = sc < ms
                bit = 1 if tag == "tm" else 2
                flags |= np.where(failed, bit, 0).astype(np.uint8)
            sel = flags != 0
            if sel.any():
                svc.stats["screened"] += int(sel.sum())
                self.frag.set_verdicts(
                    slot.codes, slot.minus,
                    slot.filt["min_tm"], slot.filt["max_dg"], slot.conc,
                    starts[elig_idx[sel]].astype(np.int32),
                    flags[sel])
            svc.stats["candidates"] += n
        self.outs = None


class DeviceScreenService:
    """Builds per-slot cost tables once and screens fragments on demand."""

    def __init__(self, opt, engine):
        import jax.numpy as jnp

        import jax
        self.engine = engine
        self.screen = TpuScreen(
            engine, dangle=opt.allow_dangle_5 or opt.allow_dangle_3)
        self.stats = {"candidates": 0, "screened": 0, "calls": 0}
        # Pallas compiles for TPU; on CPU backends (tests, dry runs) the
        # interpreter provides identical semantics
        self.interpret = jax.default_backend() != "tpu"

        self.slots = [_Slot(k, v) for k, v in collect_slots(opt)]
        self.wq_max = max((len(s.codes) for s in self.slots), default=1)
        self.wt_max = self.wq_max + 2 * C.NUM_FLANK_BASE

        # screening conditions -> per-(tag, temperature) min scores
        temps = []
        for s in self.slots:
            for tag, T, ms in self.screen.conditions(s.filt, s.conc):
                t = round(float(T), 4)
                s.min_scores[tag] = (t, ms)
                if t not in temps:
                    temps.append(t)
        self.temps = temps

        # per-temperature packed cost tables, device-resident
        self.tables = {}
        for t in temps:
            dg = engine.delta_g(np.float32(t))
            self.tables[t] = jnp.asarray(ps.pack_slot_tables(
                [ps.build_slot_tables(s.codes, dg, self.wq_max)
                 for s in self.slots]))

    @property
    def active(self):
        return bool(self.temps)

    def submit(self, frag):
        """Collect candidates from a native FragSearch ctx and enqueue the
        device screen.  Returns a FragmentScreen (resolve() before the
        fragment's searches) or None if nothing is screenable."""
        import jax.numpy as jnp

        if not self.temps:
            return None
        windows = []
        per_slot = []
        chunk_slot = []
        pos = 0
        for idx, s in enumerate(self.slots):
            if not s.min_scores:
                continue
            starts, elig, win = frag.candidates(s.codes, s.minus,
                                                self.wt_max)
            elig_idx = np.nonzero(elig)[0]
            if len(elig_idx) == 0:
                continue
            w = win[elig_idx]
            # pad this slot's windows to a CH multiple (the kernel is
            # chunk-granular and single-slot per chunk)
            n = len(w)
            padded = -(-n // ps.CH) * ps.CH
            if padded != n:
                w = np.concatenate(
                    [w, np.full((padded - n, self.wt_max), 4, np.int8)])
            windows.append(w)
            chunk_slot.extend([idx] * (padded // ps.CH))
            per_slot.append((s, starts, elig_idx, pos))
            pos += padded
        if not windows:
            return None

        wins = np.concatenate(windows).reshape(-1, ps.CH, self.wt_max)
        # pad the chunk count to a power of two: bounds the number of
        # distinct kernel shapes (each is a one-time compile, cached
        # persistently)
        nc = len(wins)
        nc_pad = 4
        while nc_pad < nc:
            nc_pad <<= 1
        if nc_pad != nc:
            wins = np.concatenate(
                [wins, np.full((nc_pad - nc, ps.CH, self.wt_max), 4,
                               np.int8)])
            chunk_slot = chunk_slot + [0] * (nc_pad - nc)
        wins_d = jnp.asarray(wins)
        cs_d = jnp.asarray(np.asarray(chunk_slot, np.int32))
        outs = {}
        for t in self.temps:
            outs[t] = ps.screen_scores(cs_d, wins_d, self.tables[t],
                                       wq=self.wq_max, wt=self.wt_max,
                                       interpret=self.interpret)
            self.stats["calls"] += 1
        return FragmentScreen(self, frag, per_slot, outs)
