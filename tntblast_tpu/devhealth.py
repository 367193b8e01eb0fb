"""Device health probe for the TPU fast path.

The chip can sit behind an RPC tunnel whose characteristics vary by
session (BASELINE.md records 0.5-50 ms launch latency; one observed
session had device-to-host transfers wedge entirely while uploads and
execution stayed live).  A search that enables the device screen on an
unhealthy link would hang on its first resolve, so every device-path
entry point gates on this probe: a tiny jit + device-to-host round trip
run in a daemon thread under a timeout.

The result is cached per process: searches are long compared to the
probe, and a link that flips mid-run would wedge either way.
"""

import os
import threading
import time

_result = None
_lock = threading.Lock()


def _probe(box):
    import jax
    import jax.numpy as jnp
    import numpy as np
    f = jax.jit(lambda a: a * 2 + 1)
    x = f(jnp.arange(8, dtype=jnp.int32))
    x.block_until_ready()
    host = np.asarray(x)          # the d2h leg — the part that can wedge
    assert int(host[3]) == 7
    # second, compile-free round trip: the steady-state latency that
    # decides whether the device path can ever pay off
    y = f(x)
    y.block_until_ready()
    t0 = time.time()
    np.asarray(y)
    box["rtt2"] = time.time() - t0
    return jax.default_backend()


def device_health(timeout=None, reprobe=False):
    """(ok, platform, reason).  ok=True means a jit launch AND a
    device-to-host read completed within `timeout` seconds on the default
    backend.  The CPU backend is always healthy (no link involved).

    The default timeout budgets for the first-call XLA compile, which
    takes ~20-40 s through the tunnel; the usefulness decision rides on
    the steady-state (compile-free) round trip, bounded separately by
    TNTBLAST_TPU_HEALTH_MAX_RTT.  `reprobe=True` discards the cached
    verdict and probes again — the tunnel wedges *intermittently*
    (minutes at a time, BASELINE.md), so a failed probe earlier in the
    process does not mean the link is still down."""
    global _result
    if timeout is None:
        timeout = float(os.environ.get("TNTBLAST_TPU_HEALTH_TIMEOUT", "60"))
    with _lock:
        if _result is not None and not (reprobe and not _result[0]):
            return _result
        try:
            import jax
            platform = jax.default_backend()
        except Exception as e:  # no usable backend at all
            _result = (False, "none", f"jax backend init failed: {e}")
            return _result
        if platform == "cpu":
            _result = (True, platform, "cpu backend")
            return _result

        box = {}

        def run():
            try:
                box["platform"] = _probe(box)
            except Exception as e:   # noqa: BLE001 — report, don't raise
                box["error"] = str(e)

        t = threading.Thread(target=run, daemon=True)
        t0 = time.time()
        t.start()
        t.join(timeout)
        rtt = time.time() - t0
        # A link can be alive but useless: one observed session had ~15 s
        # device-to-host latency — every resolve would cost seconds, so
        # the device path loses to the host by orders of magnitude.
        # Healthy means completed AND the steady-state (compile-free)
        # round trip is fast enough to ever pay off.
        max_rtt = float(os.environ.get("TNTBLAST_TPU_HEALTH_MAX_RTT", "2.0"))
        rtt2 = box.get("rtt2", rtt)
        if t.is_alive():
            _result = (False, platform,
                       f"device round trip did not complete in {timeout:.0f}s"
                       " (wedged d2h link?)")
        elif "error" in box:
            _result = (False, platform, f"probe failed: {box['error']}")
        elif rtt2 > max_rtt:
            _result = (False, platform,
                       f"steady-state round trip {rtt2:.1f}s exceeds "
                       f"usefulness bound {max_rtt:.1f}s (degraded d2h link)")
        else:
            _result = (True, platform,
                       f"round trip {rtt:.2f}s (steady {rtt2 * 1e3:.0f} ms)")
        return _result
