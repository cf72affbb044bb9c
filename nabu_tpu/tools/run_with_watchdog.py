"""Run a command; restart it when it stops making progress.

The tunneled dev TPU in this environment wedges every so often: every
device op (and the RPC behind it) blocks forever while the process
burns zero CPU (CLAUDE.md "Environment gotchas"). A long pipeline like
the parity campaign then stalls mid-stage for an hour. This wrapper

1. starts the command in its own process group,
2. samples the group's cumulative CPU time every ``--interval`` s,
3. if CPU advances less than ``--min_cpu`` s over ``--stall`` s, kills
   the process group (exact pgid, never by pattern),
4. probes the backend with a tiny matmul subprocess under timeout
   until it responds again,
5. relaunches the command (the campaign's ``--resume`` makes restarts
   cheap), up to ``--max_restarts`` times.

    python -m nabu_tpu.tools.run_with_watchdog --stall 480 -- \
        python -m nabu_tpu.tools.parity_campaign --out /tmp/parity --resume
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _group_cpu_seconds(pgid: int) -> float:
    """Total utime+stime (incl. reaped children's cutime+cstime) of all
    live processes in the group.

    cutime/cstime matter for monotonicity: the campaign runs each stage
    as a subprocess, and when a CPU-heavy stage exits its utime/stime
    vanish from the live-process sum — but they reappear in the parent's
    cutime/cstime the moment it reaps the child, so including fields
    16/17 keeps the group total cumulative across stage transitions
    instead of dropping sharply (which would park the baseline below
    reality and falsely kill a healthy pipeline as stalled)."""
    hz = os.sysconf("SC_CLK_TCK")
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state ppid pgrp ... utime=11 stime=12
            # cutime=13 cstime=14 (0-indexed after the comm split)
            if int(parts[2]) != pgid:
                continue
            total += (
                int(parts[11]) + int(parts[12])
                + int(parts[13]) + int(parts[14])
            ) / hz
        except (OSError, IndexError, ValueError):
            continue
    return total


def _probe_backend(timeout_s: int = 90) -> bool:
    """True if a trivial device op completes within the timeout."""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print('PROBE_OK', float((x @ x).sum()))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        return "PROBE_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="run_with_watchdog", description=__doc__
    )
    p.add_argument("--interval", type=float, default=60.0,
                   help="seconds between CPU samples")
    p.add_argument("--stall", type=float, default=900.0,
                   help="kill after this long without CPU progress. "
                        "NOTE: waiting on the REMOTE compile service "
                        "burns ~0 local CPU and large configs can "
                        "compile >570 s through the tunnel "
                        "(CLAUDE.md), so keep this comfortably above "
                        "the worst expected single compile — a too-"
                        "tight stall kills healthy first-epoch runs "
                        "that compile several bucket shapes "
                        "back-to-back")
    p.add_argument("--min_cpu", type=float, default=1.0,
                   help="CPU seconds over --stall that count as alive")
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("--probe_wait", type=float, default=60.0,
                   help="seconds between backend probes while down")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (separate with --)")

    for attempt in range(args.max_restarts + 1):
        proc = subprocess.Popen(cmd, start_new_session=True)
        pgid = os.getpgid(proc.pid)
        # progress baseline: advance it whenever the group accumulated
        # >= min_cpu since the baseline; stall = baseline older than
        # --stall seconds
        base_cpu = _group_cpu_seconds(pgid)
        base_t = time.time()
        stalled = False
        while proc.poll() is None:
            time.sleep(args.interval)
            cpu = _group_cpu_seconds(pgid)
            now = time.time()
            # cpu < base_cpu is a belt-and-braces reset: even with
            # cutime/cstime counted, CPU can still drop (e.g. a stage's
            # own grandchildren exit unreaped) — never let a negative
            # delta freeze the baseline and mis-kill a healthy run
            if cpu - base_cpu >= args.min_cpu or cpu < base_cpu:
                base_cpu, base_t = cpu, now
            elif now - base_t >= args.stall:
                stalled = True
                break
        if not stalled:
            print(f"[watchdog] command exited rc={proc.returncode}",
                  flush=True)
            return proc.returncode or 0
        print(f"[watchdog] no CPU progress in {args.stall:.0f}s — "
              f"killing process group {pgid}", flush=True)
        try:
            os.killpg(pgid, signal.SIGTERM)
            time.sleep(5)
            os.killpg(pgid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        if attempt == args.max_restarts:
            break
        print("[watchdog] probing backend until it responds",
              flush=True)
        while not _probe_backend():
            print(f"[watchdog] backend still unresponsive; retry in "
                  f"{args.probe_wait:.0f}s", flush=True)
            time.sleep(args.probe_wait)
        print(f"[watchdog] backend recovered — restart "
              f"{attempt + 1}/{args.max_restarts}", flush=True)
    print("[watchdog] giving up after max restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
