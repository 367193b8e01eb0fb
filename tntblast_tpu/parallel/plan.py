"""Search-plan builder: binds the assay panel to the device pipeline.

Collects every unique (oligo, strand, screening-bounds) slot used by the
expanded assay list, packs them into one DevicePanel, and per fragment
produces (a) the seed-diagonal lists each match/bind call needs — in the
reference's exact iteration order — and (b) ScreenStub cache entries for
every window the device DP proved hit-free (see screen.py for the
conservativeness argument).

The engine work loop stays bit-identical: it consumes these seeds instead
of re-scanning on the host, and the pre-stubbed melt caches short-circuit
exact evaluation of provably-failing windows.
"""

import numpy as np

from tntblast_tpu import constants as C
from tntblast_tpu.screen import ScreenStub, TpuScreen
from tntblast_tpu.search import seed as seed_mod
from tntblast_tpu.parallel.device_search import (
    INT_MIN, DevicePanel, PanelConfig)


def _round_pow2(n):
    return 1 << (int(n) - 1).bit_length()


class DeviceSearchPlan:
    """Per-run device search state (panel + compiled fragment step)."""

    def __init__(self, opt, engine, db, max_product_length):
        self.opt = opt
        self.engine = engine
        self.screen = TpuScreen(
            engine, dangle=opt.allow_dangle_5 or opt.allow_dangle_3)
        self.enabled = True
        self.fallbacks = 0

        word_len = opt.hash_word_size

        # ---- collect slots -------------------------------------------------
        # slot key: (oligo, minus, min_tm, max_dg, conc)
        slots = {}

        def add(oligo, minus, min_tm, max_dg, conc):
            if oligo is None:
                return
            key = (oligo, minus, float(min_tm), float(max_dg), float(conc))
            if key not in slots:
                slots[key] = len(slots)

        for sig in opt.sig_list:
            if sig.has_primers():
                if opt.assay_format == C.ASSAY_PCR:
                    fmintm, fmaxdg = opt.min_primer_tm, opt.max_primer_dg
                else:  # padlock/MIPS arms are filtered with probe bounds
                    fmintm, fmaxdg = opt.min_probe_tm, opt.max_probe_dg
                fc = opt.forward_primer_strand / sig.forward_degen
                rc = opt.reverse_primer_strand / sig.reverse_degen
                for minus in (True, False):
                    add(sig.forward_oligo, minus, fmintm, fmaxdg, fc)
                    add(sig.reverse_oligo, minus, fmintm, fmaxdg, rc)
            if sig.has_probe():
                pc = opt.probe_strand / sig.probe_degen
                for minus in (True, False):
                    add(sig.probe_oligo, minus, opt.min_probe_tm,
                        opt.max_probe_dg, pc)

        self.slot_keys = list(slots)
        if not self.slot_keys:
            self.enabled = False
            return

        # ---- conditions ----------------------------------------------------
        # distinct screen temperatures across slots; per-slot thresholds
        cond_temps = []
        slot_conds = []  # per slot: list of (temp_index, min_score)
        for (oligo, minus, min_tm, max_dg, conc) in self.slot_keys:
            cs = []
            for tag, T, ms in self.screen.conditions(
                    {"min_tm": min_tm, "max_dg": max_dg}, conc):
                Tr = round(float(T), 4)
                if Tr not in cond_temps:
                    cond_temps.append(Tr)
                cs.append((cond_temps.index(Tr), ms))
            slot_conds.append(cs)
        self.num_cond = max(1, len(cond_temps))
        if not cond_temps:
            cond_temps = [float(engine.target_T)]

        thresholds = np.full((self.num_cond, len(self.slot_keys)), INT_MIN,
                             dtype=np.int32)
        for s, cs in enumerate(slot_conds):
            for ti, ms in cs:
                thresholds[ti, s] = ms
        dg_tables = np.stack([
            np.asarray(self.screen._dg_table(T)) for T in cond_temps])

        # ---- panel ---------------------------------------------------------
        panel = []
        max_words = 1
        wq_max = 1
        for (oligo, minus, _, _, _) in self.slot_keys:
            codes = C.ASCII_TO_MELT[np.frombuffer(oligo.encode(), np.uint8)]
            words = seed_mod.oligo_word_list(codes, word_len,
                                             complement=not minus)
            panel.append({"words": words, "codes": codes, "minus": minus})
            max_words = max(max_words, len(words))
            wq_max = max(wq_max, len(codes))

        # ---- static shapes -------------------------------------------------
        max_frag = 0
        for i in range(db.size()):
            L = db.approx_seq_len(i)
            delta = seed_mod and None  # placeholder for clarity
            from tntblast_tpu.io.fastx import seq_len_increment
            d, _ = seq_len_increment(L, opt.fragment_target_threshold)
            max_frag = max(max_frag, min(L, d + 1 + max_product_length))
        tile_len = max(4096, int(max_frag) + 8)
        tile_len = (tile_len + 4095) // 4096 * 4096

        num_os = _round_pow2(len(self.slot_keys))
        expected = (len(self.slot_keys) * tile_len * max_words
                    // (4 ** word_len) + 1)
        cap = min(1 << 17, _round_pow2(8 * expected + 2048))

        self.config = PanelConfig(
            word_len=word_len, num_os=num_os, max_words=max_words,
            wq_max=wq_max, tile_len=tile_len, cap=cap,
            num_cond=self.num_cond)
        self.panel = DevicePanel(panel, self.config, dg_tables, thresholds)

        # index: (oligo, minus) -> slot ids (seed data identical across
        # filts; stubs are per-slot)
        self.by_oligo_strand = {}
        for i, (oligo, minus, _, _, _) in enumerate(self.slot_keys):
            self.by_oligo_strand.setdefault((oligo, minus), []).append(i)

    # ------------------------------------------------------------------
    def run_fragment(self, frag_codes):
        """Returns a FragmentSeeds view or None (host fallback)."""
        if not self.enabled:
            return None
        if len(frag_codes) > self.config.tile_len:
            self.fallbacks += 1
            return None
        out = self.panel.run_fragment(frag_codes)
        if out["overflow"]:
            self.fallbacks += 1
            return None
        return FragmentSeeds(self, out, len(frag_codes))


class FragmentSeeds:
    """Device results for one fragment, reshaped for the bind layer."""

    def __init__(self, plan, out, frag_len):
        self.plan = plan
        self.frag_len = frag_len
        self._by_slot = {}
        os_idx = out["os_idx"]
        for s in range(len(plan.slot_keys)):
            sel = os_idx == s
            # device order: p ascending; reference order: delta ascending
            # == p descending
            p = out["p"][sel][::-1]
            k = out["kmin"][sel][::-1]
            keep = out["keep"][sel][::-1]
            self._by_slot[s] = (p, k, keep)

    def seeds(self, oligo, minus):
        """(q_off, t_pos) arrays in reference iteration order, or None."""
        ids = self.plan.by_oligo_strand.get((oligo, minus))
        if not ids:
            return None
        p, k, _ = self._by_slot[ids[0]]
        return k.astype(np.int64), (p + k).astype(np.int64)

    def stub_cache(self, minus):
        """{(oligo, start, stop): ScreenStub} for every screened window of
        this strand — merged into the per-fragment melt caches."""
        stubs = {}
        for s, (oligo, sminus, min_tm, max_dg, conc) in enumerate(
                self.plan.slot_keys):
            if sminus != minus:
                continue
            p, k, keep = self._by_slot[s]
            if len(p) == 0:
                continue
            window = len(oligo)
            target_length = window + 2 * C.NUM_FLANK_BASE
            filt = {"min_tm": min_tm, "max_dg": max_dg}
            for pi, ki, kp in zip(p, k, keep):
                if kp:
                    continue
                start = max(int(pi) - C.NUM_FLANK_BASE, 0)
                stop = min(start + target_length, self.frag_len)
                key = (oligo, start, stop)
                if key not in stubs:
                    stubs[key] = self.plan.screen.make_stub(
                        filt, conc, True, True)
        return stubs
