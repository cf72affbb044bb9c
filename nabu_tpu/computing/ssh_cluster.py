"""Static SSH cluster launcher.

Capability parity with nabu/computing/static (machine-list cluster
file, remote process launch over SSH, kill_processes.sh cleanup): reads
a cluster file of one host per line, launches the same ``run train
--distributed`` command on each with the right ``--process_id``, and
can kill the remote runs by pidfile (never by pattern).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from typing import List

PIDFILE = "/tmp/nabu_tpu_train.pid"


def read_cluster_file(path: str) -> List[str]:
    hosts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                hosts.append(line)
    return hosts


def launch(
    cluster_file: str,
    recipe: str,
    expdir: str,
    repo_dir: str,
    coordinator_port: int = 29500,
    extra_args: str = "",
) -> List[subprocess.Popen]:
    """Start `run train --distributed` on every host; returns Popens of
    the ssh processes (remote pid recorded in PIDFILE on each host)."""
    hosts = read_cluster_file(cluster_file)
    coordinator = f"{hosts[0]}:{coordinator_port}"
    procs = []
    for rank, host in enumerate(hosts):
        remote_cmd = (
            f"cd {repo_dir} && nohup ./run train --recipe={recipe} "
            f"--expdir={expdir} --distributed "
            f"--coordinator={coordinator} "
            f"--num_processes={len(hosts)} --process_id={rank} "
            f"{extra_args} > {expdir}/host_{rank}.log 2>&1 & "
            f"echo $! > {PIDFILE}"
        )
        procs.append(
            subprocess.Popen(
                ["ssh", "-o", "BatchMode=yes", host, remote_cmd]
            )
        )
    return procs


def kill(cluster_file: str) -> None:
    """Kill the remote training runs by their recorded pids (the
    reference's kill_processes.sh, but pid-exact, never by pattern)."""
    for host in read_cluster_file(cluster_file):
        subprocess.run(
            [
                "ssh", "-o", "BatchMode=yes", host,
                f"[ -f {PIDFILE} ] && kill $(cat {PIDFILE}) && rm {PIDFILE}"
                " || true",
            ],
            check=False,
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ssh_cluster")
    sub = p.add_subparsers(dest="command", required=True)
    lp = sub.add_parser("launch")
    lp.add_argument("--cluster", required=True, help="machine-list file")
    lp.add_argument("--recipe", required=True)
    lp.add_argument("--expdir", required=True)
    lp.add_argument("--repo", default=os.getcwd())
    lp.add_argument("--port", type=int, default=29500)
    kp = sub.add_parser("kill")
    kp.add_argument("--cluster", required=True)
    args = p.parse_args(argv)
    if args.command == "launch":
        procs = launch(
            args.cluster, args.recipe, args.expdir, args.repo, args.port
        )
        for proc in procs:
            proc.wait()
    else:
        kill(args.cluster)
    return 0


if __name__ == "__main__":
    sys.exit(main())
