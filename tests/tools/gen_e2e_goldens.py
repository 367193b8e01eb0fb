#!/usr/bin/env python3
"""Generate end-to-end golden outputs from the reference tntblast binary.

Builds deterministic synthetic FASTA databases + assay files under
tests/data/, runs the reference binary (single-threaded for determinism)
for a matrix of configurations, and stores outputs under tests/golden/e2e/.

Requires the reference build at /tmp/refbuild/tntblast (see session notes;
`bash tests/tools/gen_fixtures.sh` builds the objects).
"""

import os
import pathlib
import random
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE.parent / "data"
GOLD = HERE.parent / "golden" / "e2e"
REF_BIN = os.environ.get("TNTBLAST_REF", "/tmp/refbuild/tntblast")

COMP = {"A": "T", "T": "A", "G": "C", "C": "G"}


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def make_data():
    DATA.mkdir(parents=True, exist_ok=True)
    rng = random.Random(20260817)

    def rseq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    # --- small database: a handful of 1-3kb sequences with planted sites ---
    fwd = "TTGACCTAGATATTCAGCAAC"        # forward primer
    rev = "GGGAGAGACTCACCCAAAGATC"       # reverse primer (binds plus strand)
    probe = "CCTGTTTTGTGGAATGACATTTCC"   # TaqMan probe

    seqs = []
    for i in range(6):
        body = rseq(rng.randint(900, 2500))
        if i in (0, 2, 4):
            # plant a perfect amplicon: fwd ... probe ... revcomp(rev)
            insert = fwd + rseq(40) + probe + rseq(60) + revcomp(rev)
            pos = rng.randint(100, len(body) - 100)
            body = body[:pos] + insert + body[pos:]
        if i == 2:
            # plant a mutated site as well (1 mismatch in each primer)
            f2 = list(fwd); f2[10] = {"A": "C", "C": "A", "G": "T", "T": "G"}[f2[10]]
            r2 = list(rev); r2[5] = {"A": "C", "C": "A", "G": "T", "T": "G"}[r2[5]]
            insert = "".join(f2) + rseq(120) + revcomp("".join(r2))
            body = body[:50] + insert + body[50:]
        if i == 5:
            # reverse orientation site (assay fires on the minus strand)
            insert = rev + rseq(80) + revcomp(fwd)
            pos = rng.randint(100, len(body) - 100)
            body = body[:pos] + insert + body[pos:]
        seqs.append((f"synth_{i} length={len(body)}", body))

    with open(DATA / "small_db.fna", "w") as fh:
        for name, s in seqs:
            fh.write(f">{name}\n")
            for k in range(0, len(s), 70):
                fh.write(s[k:k + 70] + "\n")

    # --- long-sequence database to exercise fragmentation -----------------
    long_body = rseq(30000)
    for pos in (1500, 9000, 9400, 21000, 28000):
        insert = fwd + rseq(90) + revcomp(rev)
        long_body = long_body[:pos] + insert + long_body[pos:]
    with open(DATA / "long_db.fna", "w") as fh:
        fh.write(">long_contig test fragmentation\n")
        for k in range(0, len(long_body), 80):
            fh.write(long_body[k:k + 80] + "\n")

    # --- assay input files -------------------------------------------------
    with open(DATA / "assay_pcr.txt", "w") as fh:
        fh.write(f"pcrA\t{fwd}\t{rev}\n")
    with open(DATA / "assay_taqman.txt", "w") as fh:
        fh.write(f"taqA\t{fwd}\t{rev}\t{probe}\n")
    with open(DATA / "assay_probe.txt", "w") as fh:
        fh.write(f"probeA\t{probe}\n")
        fh.write(f"probeB\t{fwd}\n")
    with open(DATA / "assay_degen.txt", "w") as fh:
        # degenerate + inosine bases
        f_d = fwd[:6] + "R" + fwd[7:14] + "Y" + fwd[15:]
        r_d = rev[:10] + "N" + rev[11:]
        p_d = probe[:12] + "I" + probe[13:]
        fh.write(f"degA\t{f_d}\t{r_d}\t{p_d}\n")
    with open(DATA / "assay_padlock.txt", "w") as fh:
        # two halves binding adjacently on the plus strand: upstream(5') and
        # downstream(3') arms of a ligation probe
        up = probe[:12]
        down = probe[12:]
        fh.write(f"padA\t{down}\t{up}\n")
        fh.write(f"padB\t{probe[2:13]}\t{probe[13:]}\n")

    return seqs


CONFIGS = [
    # name, args
    ("probe_small", ["-i", "assay_probe.txt", "-d", "small_db.fna",
                     "-A", "PROBE", "-E", "40"]),
    ("probe_dg", ["-i", "assay_probe.txt", "-d", "small_db.fna",
                  "-A", "PROBE", "-Z", "-9999", "-E", "0"]),
    ("pcr_small", ["-i", "assay_pcr.txt", "-d", "small_db.fna",
                   "-A", "PCR", "-e", "40", "-E", "40"]),
    ("pcr_lowtm", ["-i", "assay_pcr.txt", "-d", "small_db.fna",
                   "-A", "PCR", "-e", "20", "-E", "20", "-l", "500"]),
    ("taqman", ["-i", "assay_taqman.txt", "-d", "small_db.fna",
                "-A", "PCR", "-e", "40", "-E", "40"]),
    ("taqman_clamp", ["-i", "assay_taqman.txt", "-d", "small_db.fna",
                      "-A", "PCR", "-e", "30", "-E", "30",
                      "--primer-clamp", "2", "--probe-clamp5", "1"]),
    ("degen", ["-i", "assay_degen.txt", "-d", "small_db.fna",
               "-A", "PCR", "-e", "30", "-E", "30"]),
    ("pcr_frag", ["-i", "assay_pcr.txt", "-d", "long_db.fna",
                  "-A", "PCR", "-e", "40", "-E", "40",
                  "--max-target-len", "5000"]),
    ("padlock", ["-i", "assay_padlock.txt", "-d", "small_db.fna",
                 "-A", "PADLOCK", "-E", "20"]),
    ("pcr_best", ["-i", "assay_pcr.txt", "-d", "small_db.fna",
                  "-A", "PCR", "-e", "20", "-E", "20", "--best-match"]),
    ("pcr_dinkelbach", ["-i", "assay_pcr.txt", "-d", "small_db.fna",
                        "-A", "PCR", "-e", "40", "-E", "40",
                        "--dinkelbach", "T"]),
    # NOTE: the reference binary aborts (uncaught THROW) when --dangle5/3
    # are enabled on this input; dangling-end parity is covered by the
    # melt-engine unit fixtures instead.
    ("probe_plus_only", ["-i", "assay_probe.txt", "-d", "small_db.fna",
                         "-A", "PROBE", "-E", "40",
                         "--target-strand", "plus"]),
    ("pcr_single_primer_off", ["-i", "assay_pcr.txt", "-d", "small_db.fna",
                               "-A", "PCR", "-e", "20", "-E", "20",
                               "--single-primer-pcr", "F"]),
    ("mips", ["-i", "assay_padlock.txt", "-d", "small_db.fna",
              "-A", "MIPS", "-E", "20", "-l", "30"]),
    ("plex", ["-i", "assay_taqman.txt", "-d", "small_db.fna",
              "-A", "PCR", "-e", "30", "-E", "30", "--plex", "T"]),
]


def main():
    make_data()
    GOLD.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ, OMP_NUM_THREADS="1")
    for name, args in CONFIGS:
        out = GOLD / f"{name}.out"
        full = [REF_BIN] + args + ["-o", str(out)]
        r = subprocess.run(full, cwd=DATA, env=env,
                           capture_output=True, text=True)
        (GOLD / f"{name}.stdout").write_text(r.stdout)
        (GOLD / f"{name}.cmd").write_text(" ".join(args) + "\n")
        status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
        nlines = len(out.read_text().splitlines()) if out.exists() else -1
        print(f"{name}: {status} ({nlines} output lines)")
        if r.returncode != 0:
            print(r.stderr[:500])
            sys.exit(1)


if __name__ == "__main__":
    main()
