#!/usr/bin/env python3
"""Record reference goldens for the I/O breadth configs: FASTQ, gzipped
FASTA/FASTQ inputs (reference sequence_data_fastx.cpp:13-185) and forced
query segmentation (--query-seg T, tntblast_util.cpp:1793-1844).

Derives the FASTQ/gzip databases from the existing tests/data/small_db.fna
(so the planted assay sites are identical across formats) and runs the
reference binary at /tmp/refbuild/tntblast single-threaded.
"""

import gzip
import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
DATA = HERE.parent / "data"
GOLD = HERE.parent / "golden" / "e2e"
REF_BIN = os.environ.get("TNTBLAST_REF", "/tmp/refbuild/tntblast")


def make_data():
    fna = (DATA / "small_db.fna").read_text().splitlines()
    # flatten to (defline, seq) records
    recs = []
    for line in fna:
        if line.startswith(">"):
            recs.append([line[1:], []])
        else:
            recs[-1][1].append(line)
    recs = [(d, "".join(parts)) for d, parts in recs]

    with open(DATA / "small_db.fastq", "w") as fh:
        for d, s in recs:
            # vary quality symbols so the parser must actually skip them
            qual = "".join("IJKLMNOP"[i % 8] for i in range(len(s)))
            fh.write(f"@{d}\n{s}\n+\n{qual}\n")

    with open(DATA / "small_db.fna") as src, \
            gzip.open(DATA / "small_db.fna.gz", "wt", compresslevel=6) as dst:
        dst.write(src.read())
    with open(DATA / "small_db.fastq") as src, \
            gzip.open(DATA / "small_db.fastq.gz", "wt",
                      compresslevel=6) as dst:
        dst.write(src.read())


CONFIGS = [
    ("fastq_pcr", ["-i", "assay_pcr.txt", "-d", "small_db.fastq",
                   "-A", "PCR", "-e", "40", "-E", "40"]),
    ("fasta_gz_pcr", ["-i", "assay_pcr.txt", "-d", "small_db.fna.gz",
                      "-A", "PCR", "-e", "40", "-E", "40"]),
    ("fastq_gz_taqman", ["-i", "assay_taqman.txt", "-d",
                         "small_db.fastq.gz", "-A", "PCR",
                         "-e", "30", "-E", "30"]),
    ("query_seg", ["-i", "assay_probe.txt", "-d", "small_db.fna",
                   "-A", "PROBE", "-E", "40", "--query-seg", "always"]),
    ("query_seg_frag", ["-i", "assay_pcr.txt", "-d", "long_db.fna",
                        "-A", "PCR", "-e", "40", "-E", "40",
                        "--max-target-len", "5000",
                        "--query-seg", "always"]),
]


def main():
    make_data()
    env = dict(os.environ, OMP_NUM_THREADS="1")
    for name, args in CONFIGS:
        out = GOLD / f"{name}.out"
        r = subprocess.run([REF_BIN] + args + ["-o", str(out)], cwd=DATA,
                           env=env, capture_output=True, text=True)
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
