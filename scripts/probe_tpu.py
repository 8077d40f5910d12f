"""Safe TPU-relay availability probe.

Exit 0 if the axon relay answers a trivial dispatch within the window,
exit 1 otherwise — WITHOUT ever being timeout-killed from outside (an
interrupted client wedges the relay's far side for 10-30 min; bench.py
docstring). The probe runs on a daemon thread so a hung dispatch cannot
keep the process alive past the bound.

Usage: python scripts/probe_tpu.py [window_s]
"""

import sys
import threading
import time


def main() -> int:
    window_s = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    done = threading.Event()
    t0 = time.monotonic()

    def probe():
        import jax.numpy as jnp

        try:
            val = float(jnp.sum(jnp.ones((8, 8))))
            assert val == 64.0
            done.set()
        except Exception as e:  # noqa: BLE001
            print(f"[probe] dispatch failed: {e}", file=sys.stderr)

    threading.Thread(target=probe, daemon=True).start()
    if done.wait(window_s):
        print(f"[probe] relay UP ({time.monotonic() - t0:.1f}s)")
        return 0
    print(f"[probe] relay DOWN (no answer in {window_s:.0f}s)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
