// Dump the reference melt engine's internal parameter tables as JSON golden
// fixtures. TEST TOOL ONLY: uses the `#define private public` trick to read
// the private table members of the upstream NucCruc class (read-only
// reference checkout; compiled out-of-tree).

#define private public
#include "nuc_cruc.h"
#undef private

#include <cstdio>

int main(int argc, char** argv)
{
    const char* out_path = (argc > 1) ? argv[1] : "table_fixtures.json";
    FILE* f = fopen(out_path, "w");
    if (!f) { perror("fopen"); return 1; }

    NucCruc melt(NucCruc::SANTA_LUCIA, 310.15f);
    melt.Salt(0.05f);

    auto dump_f = [&](const char* name, const float* v, int n, bool last=false) {
        fprintf(f, "\"%s\": [", name);
        for (int i = 0; i < n; ++i) fprintf(f, "%s%.9g", i ? "," : "", (double)v[i]);
        fprintf(f, "]%s\n", last ? "" : ",");
    };
    auto dump_i = [&](const char* name, const int* v, int n, bool last=false) {
        fprintf(f, "\"%s\": [", name);
        for (int i = 0; i < n; ++i) fprintf(f, "%s%d", i ? "," : "", v[i]);
        fprintf(f, "]%s\n", last ? "" : ",");
    };

    fputs("{\n", f);
    dump_f("param_H", melt.param_H, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_f("param_S", melt.param_S, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_f("param_loop_terminal_H", melt.param_loop_terminal_H, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_f("param_loop_terminal_S", melt.param_loop_terminal_S, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_f("param_hairpin_terminal_H", melt.param_hairpin_terminal_H, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_f("param_hairpin_terminal_S", melt.param_hairpin_terminal_S, NUM_BASE_PAIR * NUM_BASE_PAIR);
    dump_i("delta_g_T310.15_salt0.05", melt.delta_g, NUM_BASE_PAIR * NUM_BASE_PAIR);
    melt.temperature(273.15f);
    dump_i("delta_g_T273.15_salt0.05", melt.delta_g, NUM_BASE_PAIR * NUM_BASE_PAIR);
    melt.temperature(310.15f);
    melt.Salt(0.5f);
    dump_i("delta_g_T310.15_salt0.5", melt.delta_g, NUM_BASE_PAIR * NUM_BASE_PAIR);
    melt.Salt(0.05f);
    // Note: reference leaves the last element of each *_S length array
    // uninitialized (loops run to < MAX_*_LENGTH); dump one element short.
    dump_f("param_loop_S", melt.param_loop_S, MAX_LOOP_LENGTH);
    dump_f("param_bulge_S", melt.param_bulge_S, MAX_BULGE_LENGTH);
    dump_f("param_hairpin_S", melt.param_hairpin_S, MAX_HAIRPIN_LENGTH);
    dump_f("param_hairpin_special_H", melt.param_hairpin_special_H, 131);
    dump_f("param_hairpin_special_S", melt.param_hairpin_special_S, 131);
    dump_f("param_supp", melt.param_supp, NucCruc::NUM_SUPP_PARAM);
    dump_f("param_supp_salt", melt.param_supp_salt, NucCruc::NUM_SALT_PARAM);

    float scalars[8] = { melt.param_init_H, melt.param_init_S,
        melt.param_AT_closing_H, melt.param_AT_closing_S,
        melt.param_symmetry_S, melt.param_SALT,
        melt.param_asymmetric_loop_dS, melt.param_bulge_AT_closing_S };
    dump_f("scalars_initH_initS_atH_atS_symS_salt_asymS_bulgeatS", scalars, 8);

    int wc[NUM_BASE_PAIR];
    for (int i = 0; i < NUM_BASE_PAIR; ++i) wc[i] = melt.watson_and_crick[i] ? 1 : 0;
    dump_i("watson_and_crick", wc, NUM_BASE_PAIR, true);
    fputs("}\n", f);
    fclose(f);
    fprintf(stderr, "wrote %s\n", out_path);
    return 0;
}
