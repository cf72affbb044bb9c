#!/usr/bin/env bash
# Collect the committed benchmark evidence (round-2 verdict Next #5/#6):
# every bench mode's JSON line lands as a file under BENCH_extra/ so the
# scaling projection, loader-path throughput (incl. padding waste), MFU
# fields and per-head decode RTFs are inspectable artifacts, not prose.
#
#   bash tools/collect_bench_artifacts.sh [outdir]
#
# Runs ONE bench at a time (never two TPU processes concurrently) and
# probes the tunnel first — the dev TPU can wedge (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=${1:-BENCH_extra}
mkdir -p "$OUT"

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print('PROBE_OK', float((x @ x).sum()))
" 2>/dev/null | grep -q PROBE_OK
}

run_one() {  # run_one <outfile> <bench args...>
  local f="$OUT/$1"; shift
  if ! probe; then
    echo "[collect] TPU unresponsive — skipping $f" >&2
    return 1
  fi
  echo "[collect] bench $* -> $f" >&2
  # keep only the JSON result line; warnings stay on stderr
  if timeout 2400 python bench.py "$@" 2>"$f.stderr" | tail -1 >"$f"; then
    rm -f "$f.stderr"
    cat "$f"
  else
    echo "[collect] FAILED: $f (stderr kept)" >&2
  fi
}

# training throughput + MFU + real-loader path (padding waste included)
run_one train_dblstm_loader.json --loader --skip_baseline
run_one train_las.json --model las --skip_baseline
run_one train_rnnt.json --model rnnt --skip_baseline

# decode RTFs: CTC prefix beam, attention beam, one-pass joint,
# transducer time-synchronous beam (README decode table coverage)
run_one decode_ctc_beam.json --mode decode
run_one decode_las_att_beam.json --mode decode --model las --head att
run_one decode_las_joint_beam.json --mode decode --model las --head joint
run_one decode_las_ctc_head.json --mode decode --model las --head ctc
run_one decode_transducer_beam.json --mode decode --model rnnt
run_one decode_att_beam16.json --mode decode --model las --head att \
  --beam_width 16

# simulated weak scaling + ICI projection (CPU subprocesses — run last,
# does not touch the TPU)
echo "[collect] bench --mode scaling -> $OUT/scaling.json" >&2
timeout 2400 python bench.py --mode scaling 2>/dev/null \
  | tail -1 >"$OUT/scaling.json" && cat "$OUT/scaling.json"

echo "[collect] done; artifacts in $OUT/" >&2
