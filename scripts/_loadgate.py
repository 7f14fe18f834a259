"""Host-load gating for committed bench artifacts (VERDICT r10 #4).

The r10 sf1 rehearsal ran at loadavg 23.5 and BASELINE.md needed a
paragraph of caveats to explain which numbers came from a loaded box.
Benches now check /proc/loadavg BEFORE the timed pass: wait (bounded)
for a quiet window, and if one never comes, stamp the artifact with
``load_waiver: true`` so quiet/loaded passes are machine-distinguishable
instead of prose-distinguishable.

The check runs before the harness's own warmup (the warmup saturates
all cores, so a post-warmup 1-min loadavg mostly measures ourselves);
``loadavg_end`` in the artifact still records the exit state.
"""

from __future__ import annotations

import os
import time

#: "quiet" on the 32-core bench host: < a quarter of the cores busy
#: with OTHER work before we start
QUIET_LOAD = 8.0
#: bounded wait — a rehearsal must not stall a round indefinitely
WAIT_MAX_SEC = 1200
POLL_SEC = 30


def wait_quiet(
    threshold: float = QUIET_LOAD,
    timeout_sec: int = WAIT_MAX_SEC,
    poll_sec: int = POLL_SEC,
) -> tuple[float, bool]:
    """Block until 1-min loadavg < ``threshold`` or ``timeout_sec``
    passes. Returns (loadavg_at_go, load_waiver) — waiver True means
    the box never quieted and the artifact's numbers carry ambient
    contention."""
    t0 = time.monotonic()
    while True:
        la = os.getloadavg()[0]
        if la < threshold:
            return la, False
        if time.monotonic() - t0 >= timeout_sec:
            print(
                f"load gate: still {la:.1f} after {timeout_sec}s — "
                "proceeding with load_waiver=true",
                flush=True,
            )
            return la, True
        print(
            f"load gate: loadavg {la:.1f} >= {threshold} — waiting for a "
            "quiet window",
            flush=True,
        )
        time.sleep(poll_sec)
