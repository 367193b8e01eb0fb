"""One-shot TPU link probe: prints one JSON line and exits 0 iff healthy.

Exit status drives tools/tpu_watch.sh's decision to launch the expensive
device benchmarks; the JSON line is appended to the watch log either way.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TNTBLAST_TPU_HEALTH_TIMEOUT", "75")

from tntblast_tpu.devhealth import device_health  # noqa: E402

t0 = time.time()
ok, platform, reason = device_health()
print(json.dumps({
    "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
    "ok": bool(ok), "platform": platform, "reason": reason,
    "probe_s": round(time.time() - t0, 2),
}))
sys.stdout.flush()
# A wedged probe leaves a daemon thread in the PJRT client; skip teardown.
os._exit(0 if ok and platform != "cpu" else 1)
