#!/usr/bin/env python
"""Wait for the tunneled TPU backend with exactly one patient client.

Operational tool for the axon-tunnel failure mode documented in
docs/ROADMAP.md §4 and the bench's ``_wait_for_backend``: after any TPU
client is killed mid-claim, the backend cycles UNAVAILABLE — each new
client-init attempt blocks ~25 minutes before raising, and a herd of
retrying clients keeps the claim queue saturated indefinitely.  The
rules this tool encodes:

* ONE waiting client per machine.  ``--scan`` lists other live python
  processes that look like TPU clients (so stale ones from dead
  sessions can be killed BY PID) and refuses to wait while any exist,
  unless ``--force``.
* NO outer ``timeout``: a SIGKILLed init attempt re-wedges the claim.
  All retrying happens in-process (UNAVAILABLE raises are safe to
  retry; hung attempts are left to finish).
* Exits 0 the moment a real device op completes; prints one status
  line per attempt so log-polling shows liveness.

Usage::

    nohup python tools/tpu_wait.py > /tmp/tpu_wait.log 2>&1 &
    # ... poll /tmp/tpu_wait.log; exit code 0 == healthy backend
"""

from __future__ import annotations

import argparse
import sys
import time


def scan_tpu_clients() -> list[tuple[int, str]]:
    """(pid, cmdline) of OTHER live python processes holding libtpu/axon
    mappings — candidates for stale-claim holders."""
    import os
    import re

    me = os.getpid()
    out = []
    for pid_dir in os.listdir("/proc"):
        if not pid_dir.isdigit() or int(pid_dir) == me:
            continue
        try:
            with open(f"/proc/{pid_dir}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode(errors="replace")
            if "python" not in cmd:
                continue
            with open(f"/proc/{pid_dir}/maps") as fh:
                maps = fh.read()
            if re.search(r"libtpu|axon", maps):
                out.append((int(pid_dir), cmd.strip()[:120]))
        except OSError:
            continue
    return out


def wait(patience_s: float, interval_s: float) -> int:
    deadline = time.monotonic() + patience_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        try:
            import jax
            import jax.numpy as jnp

            dev = jax.devices()[0]
            x = jnp.ones((256, 256), jnp.bfloat16)
            float((x @ x).sum())  # real device op; sync via scalar pull
            print(f"TPU OK after {time.monotonic() - t0:.0f}s "
                  f"(attempt {attempt}): {dev}", flush=True)
            return 0
        except RuntimeError as exc:
            took = time.monotonic() - t0
            print(f"attempt {attempt}: unavailable after {took:.0f}s: "
                  f"{str(exc)[:100]}", flush=True)
            if time.monotonic() >= deadline:
                print("patience exhausted", flush=True)
                return 1
            # the failed-backend registration is cached per process;
            # clear it and retry in-process (never re-exec under timeout)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:  # noqa: BLE001
                pass
            time.sleep(interval_s)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--patience", type=float, default=6 * 3600,
                    help="give up after this many seconds (default 6 h)")
    ap.add_argument("--interval", type=float, default=60,
                    help="sleep between attempts (each failed attempt "
                         "itself blocks ~25 min in client init)")
    ap.add_argument("--scan", action="store_true",
                    help="only list other live TPU-client processes")
    ap.add_argument("--force", action="store_true",
                    help="wait even if other TPU clients are alive")
    args = ap.parse_args(argv)

    others = scan_tpu_clients()
    for pid, cmd in others:
        print(f"live TPU client: pid {pid}: {cmd}", flush=True)
    if args.scan:
        return 0
    if others and not args.force:
        print("refusing to add another waiting client (one patient "
              "client per machine); kill the stale ones BY PID or pass "
              "--force", flush=True)
        return 2
    return wait(args.patience, args.interval)


if __name__ == "__main__":
    sys.exit(main())
