"""Command-line driver (reference: tntblast.cpp:28-79 +
tntblast_local.cpp:25-231): parses options, reads assays, expands
multiplex/degenerate queries, opens the database, runs the search and
writes results.  Exit codes and error messages match the reference."""

import os
import sys
import time

from tntblast_tpu import constants as C
from tntblast_tpu import engine as eng
from tntblast_tpu import output as out
from tntblast_tpu.io.fastx import open_database
from tntblast_tpu.model import (
    read_input_file, expand_degenerate_signatures, multiplex_expansion)
from tntblast_tpu.options import Options, OptionsError


def local_main(argv, stdout=None):
    """reference tntblast_local.cpp:25-1394."""
    if stdout is None:
        stdout = sys.stdout

    opt = Options()
    try:
        opt.parse(argv)
    except OptionsError as e:
        print(f"Input error: {e}", file=sys.stderr)
        return 1

    if opt.print_usage:
        # Full usage text lives in the reference; print a short banner
        print(f"thermonucleotideBLAST v.{C.VERSION} (TPU-native)",
              file=sys.stderr)
        print("See the reference usage (options.cpp:420-498); all flags are "
              "supported.", file=sys.stderr)
        return 1

    try:
        if opt.input_filename:
            if opt.verbose:
                stdout.write(f"Reading assays from {opt.input_filename}\n")
            opt.sig_list = read_input_file(
                opt.input_filename, opt.ignore_probe,
                opt.assay_format == C.ASSAY_PROBE)

        # Output stream binding (reference tntblast_local.cpp:72-133)
        fout = None
        fout_sif = None
        fout_atr = None
        if opt.output_filename == "":
            ptr_out = stdout
        else:
            if not opt.one_output_file_per_query:
                if opt.output_format & (C.OUTPUT_STANDARD | C.OUTPUT_FASTA):
                    fout = open(opt.output_filename, "w")
                if opt.output_format & C.OUTPUT_NETWORK:
                    fout_sif = open(opt.output_filename + ".sif", "w")
            if opt.output_format & C.OUTPUT_NETWORK:
                fout_atr = open(opt.output_filename + ".atr", "w")
                fout_atr.write("FunctionalCatagory\n")
            if opt.output_format & (C.OUTPUT_INVERSE_TARGET
                                    | C.OUTPUT_INVERSE_QUERY):
                fout = open(opt.output_filename, "w")
            ptr_out = fout if fout is not None else stdout

        if opt.multiplex:
            opt.sig_list = multiplex_expansion(opt.sig_list, opt.assay_format)
        opt.sig_list = expand_degenerate_signatures(
            opt.sig_list, opt.degen_rescale_ct)

        if opt.dump_query:
            opt.write_queries(stdout)

        opt.validate_search_threshold()

        if len(opt.sig_list) == 0:
            raise OptionsError("tntblast_local.cpp:local_main: No primers or "
                               "probes found!")

        dbname = opt.dbase_filename or opt.local_dbase_filename
        if opt.verbose:
            stdout.write(f"Reading sequence database: {dbname}\n")
        db = open_database(dbname, blast_include=opt.blast_include,
                           blast_exclude=opt.blast_exclude)

        num_seq = db.size()
        if num_seq == 0:
            raise OptionsError("tntblast_local.cpp:local_main: Empty "
                               "database -- no sequences found!")
        effective_num_seq = db.effective_size(opt.fragment_target_threshold)
        if opt.verbose:
            stdout.write(f"Found {num_seq} database sequences")
            if num_seq == effective_num_seq:
                stdout.write("\n")
            else:
                stdout.write(f" ({effective_num_seq} after fragmentation)\n")
            out.echo_options(opt, stdout)

        profile = time.time()

        melt = eng.make_melt_engine(
            opt, n_threads=int(os.environ.get("TNTBLAST_TPU_THREADS", 0))
            or None)
        state = eng.run_search(opt, db, melt, stdout=stdout)

        if os.environ.get("TNTBLAST_TPU_PROFILE"):
            # reference PROFILE analogue (tntblast_worker.cpp:124-265):
            # exact-evaluation and screening work counters
            pr = getattr(state, "profile", {})
            print(f"[profile] exact melt evaluations = "
                  f"{pr.get('evaluated', 0)}", file=sys.stderr)
            print(f"[profile] device-screened windows = "
                  f"{pr.get('screened', 0)}", file=sys.stderr)
            print(f"[profile] device screen calls = "
                  f"{pr.get('device_calls', 0)}", file=sys.stderr)

        def open_per_query(name):
            nonlocal fout, fout_sif
            if opt.output_format & (C.OUTPUT_STANDARD | C.OUTPUT_FASTA):
                if fout is not None:
                    fout.close()
                fout = open(opt.output_filename + "." + name, "w")
            if opt.output_format & C.OUTPUT_NETWORK:
                if fout_sif is not None:
                    fout_sif.close()
                fout_sif = open(opt.output_filename + "." + name + ".sif",
                                "w")
            return (fout if fout is not None else stdout), fout_sif

        out.write_results(
            opt, state, db, stdout=stdout, out_stream=ptr_out,
            sif_stream=fout_sif, atr_stream=fout_atr,
            open_per_query=open_per_query if opt.one_output_file_per_query
            else None)

        profile = int(time.time() - profile)
        if opt.verbose:
            stdout.write(f"Search completed in {profile} sec\n")

        for fh in (fout, fout_sif, fout_atr):
            if fh is not None:
                fh.close()
    except OptionsError as e:
        print(f"Caught the error: {e}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"Caught the std exception: {e}", file=sys.stderr)
        return 1
    return 0


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    n_threads = int(os.environ.get("TNTBLAST_TPU_THREADS", 0)) \
        or (os.cpu_count() or 1)
    print(f"Running on local machine [{n_threads} thread(s)]")
    return local_main(argv)


if __name__ == "__main__":
    sys.exit(main())
