import os

# Tests must run without TPU hardware: force the CPU backend with a virtual
# 8-device mesh so multi-chip sharding paths compile and execute.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"
DATA_DIR = pathlib.Path(__file__).resolve().parent / "data"
