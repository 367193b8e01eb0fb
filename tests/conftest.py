import os

# Tests must run without TPU hardware: force the CPU backend with a virtual
# 8-device mesh so multi-chip sharding paths compile and execute.  (The
# session environment may preset JAX_PLATFORMS=axon — the tunneled TPU —
# which makes every jit a slow network round-trip; tests always use CPU
# unless explicitly opted in via TNTBLAST_TEST_TPU=1.)
if not os.environ.get("TNTBLAST_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize registers the TPU PJRT plugin at interpreter
    # start and pins the platform; only a config update after import
    # actually forces CPU.
    import jax
    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"
DATA_DIR = pathlib.Path(__file__).resolve().parent / "data"
