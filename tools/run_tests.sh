#!/usr/bin/env bash
# One-command green full-suite run (round-3 verdict Next #8).
#
# KNOWN ENV BUG (CLAUDE.md): this container's XLA:CPU compiler
# segfaults nondeterministically after many compiles in one process —
# three rounds in a row the same compile-heavy file took down an xdist
# worker mid-suite and had to be re-run by hand. Process isolation is
# the fix the environment allows: the compile-heaviest file
# (test_pallas_kernels.py) runs in its own fresh interpreter, and
# test_distributed.py runs last in its own process (it spawns two real
# jax.distributed workers and is flaky under heavy host load).
#
#   bash tools/run_tests.sh [extra pytest args for the main leg]
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
rc=0

echo "[tests] main suite (-n 2, isolated files excluded)" >&2
if ! python -m pytest tests/ -q -n 2 --max-worker-restart=4 \
    --ignore=tests/test_pallas_kernels.py \
    --ignore=tests/test_distributed.py "$@"; then
  # a worker the XLA:CPU segfault took down reports its current test
  # as FAILED; the test itself is innocent (passes alone, any
  # compile-heavy file can be the victim). Re-run just the reported
  # failures in ONE fresh interpreter — green there means the suite
  # is green.
  echo "[tests] re-running reported failures in a fresh process" >&2
  python -m pytest tests/ -q --lf \
    --ignore=tests/test_pallas_kernels.py \
    --ignore=tests/test_distributed.py || rc=1
fi

echo "[tests] test_pallas_kernels.py (fresh process)" >&2
python -m pytest tests/test_pallas_kernels.py -q || rc=1

echo "[tests] test_distributed.py (fresh process, last)" >&2
python -m pytest tests/test_distributed.py -q || rc=1

if [ "$rc" -ne 0 ]; then
  echo "[tests] FAILED" >&2
else
  echo "[tests] all green" >&2
fi
exit "$rc"
