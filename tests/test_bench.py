"""bench.py smoke tests: the driver runs `python bench.py` at round end
on real TPU hardware; a broken bench loses the round's measurement, so
every mode must at least run and print a valid JSON line on CPU."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*args):
    out = subprocess.run(
        [sys.executable, "bench.py", "--platform", "cpu",
         "--batch", "4", "--frames", "64", "--steps", "2",
         "--repeats", "1", *args],
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    return rec


def test_train_mode_smoke():
    rec = _run_bench("--skip_baseline")
    assert rec["metric"] == "train_audio_seconds_per_second_per_chip"
    # the MFU/utilization fields must survive every backend (round-2
    # verdict Next #2: on axon they silently vanished; now the count
    # runs in a CPU-pinned subprocess and failures warn loudly). On
    # CPU the peak-FLOPs table has no entry, so mfu itself is absent.
    assert rec["flops_per_step"] > 0
    assert rec["tflops_per_s"] > 0


def test_train_with_baseline_smoke():
    rec = _run_bench("--no-pallas_lstm", "--no-pallas_ctc", "--no-bf16")
    assert rec["vs_baseline"] > 0


def test_decode_mode_smoke():
    rec = _run_bench("--mode", "decode", "--skip_baseline",
                     "--beam_width", "2")
    assert rec["metric"] == "ctc_beam_decode_rtf"


def test_las_mode_smoke():
    rec = _run_bench("--model", "las", "--skip_baseline")
    assert rec["value"] > 0


def test_transformer_mode_smoke():
    rec = _run_bench("--model", "transformer", "--skip_baseline")
    assert rec["value"] > 0


def test_rnnt_mode_smoke():
    rec = _run_bench("--model", "rnnt", "--skip_baseline")
    assert rec["value"] > 0


def test_rnnt_decode_mode_smoke():
    rec = _run_bench("--model", "rnnt", "--mode", "decode",
                     "--skip_baseline", "--beam_width", "2")
    assert rec["metric"] == "transducer_beam_decode_rtf"


def test_conformer_rnnt_mode_smoke():
    rec = _run_bench("--model", "conformer_rnnt", "--skip_baseline")
    assert rec["value"] > 0
