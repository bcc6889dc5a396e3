"""Fail-fast TPU responsiveness probe.

The tunnel-backed TPU in this environment can wedge so hard that even
``jax.devices()`` blocks forever (observed across sessions). Anything that
is about to commit to the TPU backend should first run this probe: it
executes a trivial jitted matmul in a SUBPROCESS (so a hang cannot take
the parent down) and raises with a clear message when the backend does
not answer inside the window.

The reference has no equivalent (it assumes a healthy local CUDA device,
util/initPara.py:213-214); this is an environment-reliability upgrade.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


class TPUUnresponsiveError(RuntimeError):
    pass


_PROBE_CODE = (
    "import numpy as np, jax\n"
    "x = jax.jit(lambda a: a @ a)(np.ones((128, 128), np.float32))\n"
    "assert float(np.asarray(x)[0, 0]) == 128.0\n"
    "print('tpu-probe-ok')\n"
)


def probe_tpu(
    timeout_s: float = 60.0,
    window_s: float = 0.0,
    retry_sleep_s: float = 60.0,
    log=None,
) -> None:
    """Raise TPUUnresponsiveError unless a subprocess matmul answers in time.

    ``window_s > 0`` keeps retrying (every ``retry_sleep_s``) inside the
    window before giving up — used by bench runs that should survive a
    transient tunnel flap. ``window_s == 0`` is single-shot fail-fast —
    used by the CLI so a wedged tunnel exits loudly instead of hanging.
    Set VCRNET_SKIP_TPU_PROBE=1 to bypass entirely (tests).
    """
    if os.environ.get("VCRNET_SKIP_TPU_PROBE"):
        return
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE], timeout=timeout_s,
                capture_output=True, text=True,
            )
            if "tpu-probe-ok" in r.stdout:
                return
            msg = (
                f"tpu probe attempt {attempt} failed "
                f"(rc={r.returncode}):\n{r.stderr[-2000:]}"
            )
        except subprocess.TimeoutExpired:
            msg = (
                f"tpu probe attempt {attempt} timed out after {timeout_s:.0f}s"
            )
        if log is not None:
            log(msg)
        else:
            sys.stderr.write(msg + "\n")
        if time.monotonic() - t0 + retry_sleep_s >= window_s:
            raise TPUUnresponsiveError(
                f"TPU backend unresponsive after {attempt} probe attempt(s) "
                f"({time.monotonic() - t0:.0f}s). The tunnel is likely "
                "wedged; retry later or rerun with --platform cpu."
            )
        time.sleep(retry_sleep_s)
