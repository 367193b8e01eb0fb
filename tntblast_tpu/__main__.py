import os
import sys

from tntblast_tpu.cli import main

rc = main()
# Skip interpreter teardown: the tunneled-TPU PJRT plugin registers
# daemon threads that abort in native code during teardown when another
# platform was forced (JAX_PLATFORMS=cpu) or the link wedged mid-run.
# All output streams are flushed; the exit code is the contract.
sys.stdout.flush()
sys.stderr.flush()
os._exit(rc)
