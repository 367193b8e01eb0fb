#!/usr/bin/env python3
"""Generate GBK/EMBL golden outputs from the reference tntblast binary.

Builds a deterministic synthetic GenBank flat file (and the same content
in EMBL format) with planted assay sites at known coordinates overlapping
a spread of annotation kinds (gene, merged gene+CDS, standalone CDS with
/product promotion, pseudo-gene, tRNA on the complement strand, joined
misc_feature, intergenic spaces), then records the reference binary's
output for PCR / probe configs under tests/golden/e2e/.

The reference EMBL parser is broken upstream (next_key_EMBL's gzread
success test is inverted, so every EMBL file dies with "Unable to read
next annotation key") — the EMBL file is therefore only used for
cross-format parser-equivalence tests, not for reference goldens.

Requires the reference build at /tmp/refbuild/tntblast.
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

FWD = "TTGACCTAGATATTCAGCAAC"        # same assays as gen_e2e_goldens.py
REV = "GGGAGAGACTCACCCAAAGATC"
PROBE = "CCTGTTTTGTGGAATGACATTTCC"


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def build_records():
    rng = random.Random(20260817 + 1)

    def rseq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    # --- record A: plus-strand amplicon + isolated probe site -------------
    amp = FWD + rseq(40) + PROBE + rseq(60) + revcomp(REV)   # 167 bp
    seq_a = rseq(100) + amp + rseq(600) + PROBE + rseq(3000 - 100 -
                                                       len(amp) - 600 -
                                                       len(PROBE))
    assert len(seq_a) == 3000
    # planted coordinates (0-based): amplicon 100..266, probe2 867..890
    feat_a = [
        ("source", "1..3000", [("organism", '"Synthetica testii"')]),
        ("gene", "90..420", [("gene", '"abcA"'),
                             ("locus_tag", '"SYN_0001"')]),
        # CDS with identical range merges its qualifiers into the gene
        ("CDS", "90..420", [
            ("gene", '"abcA"'),
            ("product", '"alpha-beta-gamma protein A"'),
            ("protein_id", '"SYP00001.1"'),
            ("note", '"spans the first planted amplicon site; this note '
                     'deliberately wraps across two lines to exercise '
                     'multi-line qualifier parsing"')]),
        ("misc_feature", "join(50..120,200..260)",
         [("note", '"joined feature overlapping the amplicon"')]),
        ("tRNA", "complement(860..940)", [("product", '"tRNA-Ala"')]),
    ]

    # --- record B: minus-strand amplicon, pseudo gene, standalone CDS -----
    amp_b = REV + rseq(80) + revcomp(FWD)                    # 123 bp
    seq_b = rseq(500) + amp_b + rseq(2000 - 500 - len(amp_b))
    assert len(seq_b) == 2000
    # planted coordinates (0-based): minus amplicon 500..622
    feat_b = [
        ("source", "1..2000", [("organism", '"Synthetica altera"')]),
        # standalone CDS with /product -> promoted to gene
        ("CDS", "complement(450..560)", [
            ("product", '"orphan reading frame"'),
            ("protein_id", '"SYP00002.1"')]),
        ("gene", "480..700", [("gene", '"psdB"'),
                              ("locus_tag", '"SYN_0002"'),
                              ("pseudo", None)]),
        ("rRNA", "900..1100", [("product", '"5S ribosomal RNA"')]),
    ]

    return [("SYN0001", "Synthetica testii", seq_a, feat_a),
            ("SYN0002", "Synthetica altera", seq_b, feat_b)]


def wrap_qualifiers(quals, prefix, width=80):
    """Render /key="value" qualifier lines with GBK-style wrapping."""
    out = []
    for key, val in quals:
        if val is None:
            out.append(f"{prefix}/{key}")
            continue
        text = f"/{key}={val}"
        line = prefix + text
        if len(line) <= width:
            out.append(line)
            continue
        # wrap at spaces
        words = text.split(" ")
        cur = prefix + words[0]
        for w in words[1:]:
            if len(cur) + 1 + len(w) > width:
                out.append(cur)
                cur = prefix + w
            else:
                cur += " " + w
        out.append(cur)
    return out


def write_gbk(path, records):
    with open(path, "w") as fh:
        for acc, org, seq, feats in records:
            fh.write(f"LOCUS       {acc}            {len(seq)} bp    DNA"
                     f"     linear   SYN 01-JAN-2026\n")
            fh.write(f"DEFINITION  Synthetic annotated test molecule"
                     f" {acc}.\n")
            fh.write(f"ACCESSION   {acc}\n")
            fh.write(f"VERSION     {acc}.1\n")
            fh.write(f"SOURCE      {org}\n")
            fh.write(f"  ORGANISM  {org}\n")
            fh.write("FEATURES             Location/Qualifiers\n")
            for key, loc, quals in feats:
                fh.write(f"     {key:<16}{loc}\n")
                for line in wrap_qualifiers(quals, " " * 21):
                    fh.write(line + "\n")
            fh.write("ORIGIN      \n")
            for i in range(0, len(seq), 60):
                chunk = seq[i:i + 60]
                groups = " ".join(chunk[j:j + 10]
                                  for j in range(0, len(chunk), 10))
                fh.write(f"{i + 1:>9} {groups.lower()}\n")
            fh.write("//\n")


def write_embl(path, records):
    with open(path, "w") as fh:
        for acc, org, seq, feats in records:
            fh.write(f"ID   {acc}; SV 1; linear; genomic DNA; STD; SYN; "
                     f"{len(seq)} BP.\n")
            fh.write(f"AC   {acc};\n")
            fh.write(f"DE   Synthetic annotated test molecule {acc}.\n")
            fh.write(f"OS   {org}\n")
            fh.write("FH   Key             Location/Qualifiers\n")
            fh.write("FH\n")
            for key, loc, quals in feats:
                fh.write(f"FT   {key:<16}{loc}\n")
                for line in wrap_qualifiers(quals, "FT" + " " * 19):
                    fh.write(line + "\n")
            fh.write(f"SQ   Sequence {len(seq)} BP;\n")
            for i in range(0, len(seq), 60):
                chunk = seq[i:i + 60].lower()
                groups = " ".join(chunk[j:j + 10]
                                  for j in range(0, len(chunk), 10))
                fh.write(f"     {groups:<66}{i + len(chunk):>9}\n")
            fh.write("//\n")


CONFIGS = [
    ("gbk_pcr", ["-i", "assay_pcr.txt", "-d", "annot_db.gbk",
                 "-A", "PCR", "-e", "40", "-E", "40"]),
    ("gbk_probe", ["-i", "assay_probe.txt", "-d", "annot_db.gbk",
                   "-A", "PROBE", "-E", "40"]),
    ("gbk_taqman", ["-i", "assay_taqman.txt", "-d", "annot_db.gbk",
                    "-A", "PCR", "-e", "30", "-E", "30"]),
]


def main():
    records = build_records()
    DATA.mkdir(parents=True, exist_ok=True)
    write_gbk(DATA / "annot_db.gbk", records)
    write_embl(DATA / "annot_db.embl", records)

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
            print(r.stderr[:800])
            sys.exit(1)


if __name__ == "__main__":
    main()
