#!/usr/bin/env bash
# Collect the committed benchmark evidence (round-2 verdict Next #5/#6):
# every bench mode's JSON line lands as a file under BENCH_extra/ so the
# scaling projection, loader-path throughput (incl. padding waste), MFU
# fields, per-head decode RTFs and the kernel roofline are inspectable
# artifacts, not prose.
#
#   bash tools/collect_bench_artifacts.sh [outdir]
#
# Runs ONE bench at a time (never two TPU processes concurrently) and
# probes the tunnel first — the dev TPU can wedge (CLAUDE.md). Every
# artifact goes through run_one: non-zero exit OR an empty/invalid JSON
# line removes the file and keeps stderr, so a failed bench can never
# masquerade as evidence (round-3 verdict: scaling.json was committed
# at 0 bytes because the scaling row bypassed run_one and threw stderr
# away).
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
OUT=${1:-BENCH_extra}
mkdir -p "$OUT"
FAILED=0

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print('PROBE_OK', float((x @ x).sum()))
" 2>/dev/null | grep -q PROBE_OK
}

run_one() {  # run_one <needs_tpu> <timeout_s> <outfile> <cmd...>
  local needs_tpu="$1" tmo="$2" f="$OUT/$3"; shift 3
  if [ "$needs_tpu" = tpu ] && ! probe; then
    echo "[collect] TPU unresponsive — skipping $f" >&2
    FAILED=1
    return 1
  fi
  echo "[collect] $* -> $f" >&2
  if timeout "$tmo" "$@" 2>"$f.stderr" | tail -1 >"$f" \
      && [ -s "$f" ] \
      && python -c "import json,sys; json.load(open(sys.argv[1]))" "$f" \
           2>/dev/null; then
    rm -f "$f.stderr"
    cat "$f"
  else
    echo "[collect] FAILED: $f (removed; stderr kept at $f.stderr)" >&2
    rm -f "$f"
    FAILED=1
    return 1
  fi
}

# training throughput + MFU + real-loader path (padding waste included)
run_one tpu 2400 train_dblstm_loader.json \
  python bench.py --loader --skip_baseline
run_one tpu 2400 train_las.json python bench.py --model las --skip_baseline
run_one tpu 2400 train_rnnt.json python bench.py --model rnnt --skip_baseline

# decode RTFs: CTC prefix beam, attention beam, one-pass joint,
# transducer time-synchronous beam (README decode table coverage)
run_one tpu 2400 decode_ctc_beam.json python bench.py --mode decode
run_one tpu 2400 decode_las_att_beam.json \
  python bench.py --mode decode --model las --head att
run_one tpu 2400 decode_las_joint_beam.json \
  python bench.py --mode decode --model las --head joint
run_one tpu 2400 decode_las_ctc_head.json \
  python bench.py --mode decode --model las --head ctc
run_one tpu 2400 decode_transducer_beam.json \
  python bench.py --mode decode --model rnnt
run_one tpu 2400 decode_att_beam16.json \
  python bench.py --mode decode --model las --head att --beam_width 16

# measured-vs-attainable roofline for every Pallas kernel
run_one tpu 2400 roofline.json python tools/roofline.py

# simulated weak scaling + ICI projection (CPU subprocesses — run last,
# does not touch the TPU; generous timeout: 8 child runs pay XLA:CPU
# compiles on a 2-core host)
run_one cpu 7200 scaling.json python bench.py --mode scaling

if [ "$FAILED" -ne 0 ]; then
  echo "[collect] done WITH FAILURES; artifacts in $OUT/" >&2
  exit 1
fi
echo "[collect] done; artifacts in $OUT/" >&2
