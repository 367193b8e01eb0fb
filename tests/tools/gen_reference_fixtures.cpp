// Golden-fixture generator for parity testing.
//
// Links against the UPSTREAM reference build (jgans/thermonucleotideBLAST,
// mounted read-only at /root/reference, objects compiled out-of-tree) and
// dumps thermodynamic parameter tables plus melt-engine evaluations as JSON.
// The generated fixtures are committed under tests/golden/ so the test suite
// does not need the reference checkout at run time.
//
// Build (see tests/tools/gen_fixtures.sh):
//   g++ -O2 -std=c++14 -I/root/reference gen_reference_fixtures.cpp \
//       <refbuild>/{nuc_cruc,nuc_cruc_santa_lucia,nuc_cruc_anchor,nuc_cruc_output}.o \
//       -o gen_fixtures
//
// This file is a TEST TOOL, not part of the framework.

#include "nuc_cruc.h"
#include <cstdio>
#include <cstring>
#include <cstdint>
#include <string>
#include <sstream>
#include <vector>
#include <random>

using namespace std;

// Access private members of NucCruc for table dumping: we re-declare a
// mirror-layout probe through the public API only -- tables are recovered by
// evaluating known alignments instead of peeking at private state.

static void json_escape(FILE* f, const string& s)
{
    fputc('"', f);
    for (char c : s) {
        if (c == '"' || c == '\\') { fputc('\\', f); fputc(c, f); }
        else if (c == '\n') fputs("\\n", f);
        else if (c == '\r') fputs("\\r", f);
        else fputc(c, f);
    }
    fputc('"', f);
}

// Print a float with enough digits to round-trip exactly.
static void emit_f(FILE* f, float v) { fprintf(f, "%.9g", (double)v); }

struct MeltCase {
    string query;    // 5'->3'
    string target;   // 5'->3'
    float strand_a, strand_b;
};

int main(int argc, char** argv)
{
    const char* out_path = (argc > 1) ? argv[1] : "melt_fixtures.json";
    FILE* f = fopen(out_path, "w");
    if (!f) { perror("fopen"); return 1; }

    NucCruc melt(NucCruc::SANTA_LUCIA, 310.15f);
    melt.Salt(0.05f);
    melt.dangle(false, false);  // tntblast default DANGLE_5/3 = false

    // ---- perfect-match duplex Tm table over a few sequences -------------
    vector<string> pm = {
        "AGCT", "ATATAT", "GCGCGC", "AAAAAAAAAA",
        "ACGTACGTACGTACGTACGT", "TTGACCTAGATATTCAGCAAC",
        "CCTGTTTTGTGGAATGACATTTCC", "GGGAGAGACTCACCCAAAGATC",
    };

    fputs("{\n\"tm_pm_duplex\": [", f);
    for (size_t i = 0; i < pm.size(); ++i) {
        melt.strand(9e-7f);
        float tm = melt.tm_pm_duplex(pm[i]);
        if (i) fputs(",", f);
        fputs("\n  {\"seq\": ", f); json_escape(f, pm[i]);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fputs("}", f);
    }
    fputs("\n],\n", f);

    // ---- heterodimer melt evaluations over random oligo/window pairs ----
    // Windows mimic bind_oligo: oligo + flanking target bases, with
    // mismatches/insertions/deletions/degenerate bases injected.
    mt19937 rng(20260817u);
    auto rbase = [&](void) -> char { return "ACGT"[rng() % 4]; };
    auto rdegen = [&](void) -> char { return "MRSVWYHKDBN"[rng() % 11]; };
    auto comp = [](char c) -> char {
        switch (c) { case 'A': return 'T'; case 'T': return 'A';
                     case 'G': return 'C'; case 'C': return 'G'; }
        return 'N';
    };

    vector<MeltCase> cases;
    for (int rep = 0; rep < 160; ++rep) {
        int qlen = 12 + (int)(rng() % 24);
        string q;
        for (int i = 0; i < qlen; ++i) q.push_back(rbase());
        // A plus-strand window in which the oligo binds the MINUS strand
        // contains the oligo sequence itself (plus flanks + mutations); in
        // half the cases use revcomp(q) so the same window list also
        // exercises strong PLUS-strand binding in the second fixture block.
        string t;
        if (rep % 2 == 0) {
            t = q;
        } else {
            for (int i = qlen - 1; i >= 0; --i) t.push_back(comp(q[i]));
        }
        // 5'/3' flanking bases on the target (like NUM_FLANK_BASE=4)
        string fl5, fl3;
        for (int i = 0; i < 4; ++i) { fl5.push_back(rbase()); fl3.push_back(rbase()); }
        t = fl5 + t + fl3;
        int n_mut = (int)(rng() % 4);
        for (int m = 0; m < n_mut; ++m) {
            int pos = rng() % t.size();
            int kind = rng() % 8;
            if (kind < 4) t[pos] = rbase();                 // substitution
            else if (kind < 5) t.erase(pos, 1);             // deletion
            else if (kind < 6) t.insert(pos, 1, rbase());   // insertion
            else if (kind < 7) t[pos] = rdegen();           // degenerate target
            else t[pos] = 'I';                              // inosine
        }
        MeltCase mc; mc.query = q; mc.target = t;
        mc.strand_a = 9e-7f; mc.strand_b = 0.0f;
        cases.push_back(mc);
    }
    // A few hand-picked structured cases (bulges, loops, frayed ends)
    cases.push_back({"ACGTACGTACGTACGT", "ACGTACGTTACGTACGT", 9e-7f, 0.0f});
    cases.push_back({"GGGGGGGGCCCCCCCC", "GGGGGGGGCCCCCCCC", 9e-7f, 0.0f});
    cases.push_back({"ATATATATATATATAT", "TTTTATATATATATATATTTTT", 9e-7f, 0.0f});

    fputs("\"heterodimer\": [", f);
    for (size_t i = 0; i < cases.size(); ++i) {
        const MeltCase& mc = cases[i];
        melt.clear();
        melt.set_query(mc.query);
        // Build target as the reverse complement path used by
        // bind_oligo_to_minus_strand: push_front(complement) over the window.
        melt.clear_target();
        for (char c : mc.target) melt.push_front_target(BASE::char_to_complement_nucleic_acid(c));
        melt.strand(mc.strand_a, mc.strand_b);
        float tm = melt.approximate_tm_heterodimer();

        pair<unsigned int, unsigned int> qr, tr;
        melt.alignment_range(qr, tr);

        stringstream ss; ss << melt;

        if (i) fputs(",", f);
        fputs("\n  {\"query\": ", f); json_escape(f, mc.query);
        fputs(", \"window\": ", f); json_escape(f, mc.target);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fputs(", \"dp_dg\": ", f); emit_f(f, melt.delta_G_dp());
        fprintf(f, ", \"anchor5\": %u, \"anchor3\": %u", melt.anchor5_query(), melt.anchor3_query());
        fprintf(f, ", \"num_mm\": %u, \"num_gap\": %u", melt.num_mismatch(), melt.num_gap());
        fprintf(f, ", \"max_degen\": %u", melt.max_contiguous_target_degen());
        fprintf(f, ", \"qr\": [%u, %u], \"tr\": [%u, %u]", qr.first, qr.second, tr.first, tr.second);
        fputs(", \"align\": ", f); json_escape(f, ss.str());
        fputs("}", f);
    }
    fputs("\n],\n", f);

    // ---- plus-strand orientation evaluations ---------------------------
    fputs("\"heterodimer_plus\": [", f);
    for (size_t i = 0; i < cases.size(); ++i) {
        const MeltCase& mc = cases[i];
        melt.clear();
        melt.set_query(mc.query);
        melt.clear_target();
        for (char c : mc.target) melt.push_back_target(BASE::char_to_nucleic_acid(c));
        melt.strand(mc.strand_a, mc.strand_b);
        float tm = melt.approximate_tm_heterodimer();
        pair<unsigned int, unsigned int> qr, tr;
        melt.alignment_range(qr, tr);
        stringstream ss; ss << melt;
        if (i) fputs(",", f);
        fputs("\n  {\"query\": ", f); json_escape(f, mc.query);
        fputs(", \"window\": ", f); json_escape(f, mc.target);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fprintf(f, ", \"anchor5\": %u, \"anchor3\": %u", melt.anchor5_query(), melt.anchor3_query());
        fprintf(f, ", \"num_mm\": %u, \"num_gap\": %u", melt.num_mismatch(), melt.num_gap());
        fprintf(f, ", \"qr\": [%u, %u], \"tr\": [%u, %u]", qr.first, qr.second, tr.first, tr.second);
        fputs(", \"align\": ", f); json_escape(f, ss.str());
        fputs("}", f);
    }
    fputs("\n],\n", f);

    // ---- hairpin + homodimer evaluations -------------------------------
    vector<string> oligos = {
        "GCGCAAAAGCGC", "CCTGTTTTGTGGAATGACATTTCC", "GGGAGAGACTCACCCAAAGATC",
        "ATGCATGCATGCATGCAT", "TTGACCTAGATATTCAGCAAC", "AAGGCCTTAAGGCCTT",
        "CGCGTTTTCGCG", "ACCGGTACCGGTACCGGT",
    };
    for (int rep = 0; rep < 40; ++rep) {
        int qlen = 10 + (int)(rng() % 26);
        string q;
        for (int i = 0; i < qlen; ++i) q.push_back(rbase());
        oligos.push_back(q);
    }

    fputs("\"hairpin\": [", f);
    for (size_t i = 0; i < oligos.size(); ++i) {
        melt.clear();
        melt.set_query(oligos[i]);
        melt.strand(9e-7f, 9e-7f);
        float tm = melt.approximate_tm_hairpin();
        if (i) fputs(",", f);
        fputs("\n  {\"seq\": ", f); json_escape(f, oligos[i]);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fputs("}", f);
    }
    fputs("\n],\n", f);

    fputs("\"homodimer\": [", f);
    for (size_t i = 0; i < oligos.size(); ++i) {
        melt.clear();
        melt.set_query(oligos[i]);
        melt.strand(9e-7f, 9e-7f);
        float tm = melt.approximate_tm_homodimer();
        if (i) fputs(",", f);
        fputs("\n  {\"seq\": ", f); json_escape(f, oligos[i]);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fputs("}", f);
    }
    fputs("\n],\n", f);

    // ---- Dinkelbach-mode heterodimer -----------------------------------
    melt.dinkelbach(true);
    fputs("\"heterodimer_dinkelbach\": [", f);
    for (size_t i = 0; i < 24 && i < cases.size(); ++i) {
        const MeltCase& mc = cases[i];
        melt.clear();
        melt.set_query(mc.query);
        melt.clear_target();
        for (char c : mc.target) melt.push_front_target(BASE::char_to_complement_nucleic_acid(c));
        melt.strand(mc.strand_a, mc.strand_b);
        float tm = melt.approximate_tm_heterodimer();
        if (i) fputs(",", f);
        fputs("\n  {\"query\": ", f); json_escape(f, mc.query);
        fputs(", \"window\": ", f); json_escape(f, mc.target);
        fputs(", \"tm\": ", f); emit_f(f, tm);
        fputs(", \"dH\": ", f); emit_f(f, melt.delta_H());
        fputs(", \"dS\": ", f); emit_f(f, melt.delta_S());
        fputs("}", f);
    }
    melt.dinkelbach(false);
    fputs("\n]\n}\n", f);

    fclose(f);
    fprintf(stderr, "wrote %s\n", out_path);
    return 0;
}
