"""Assemble the committed PARITY_RESULTS.md from campaign row files.

The campaign (tools/parity_campaign.py) writes one JSON row per
finished config x platform x corpus-scale under <workdir>/rows/; the
canonical copies live IN THE REPO under parity/rows/ (v2 corpus) and
parity/rows_v1/ (round-2 recovered v1 rows), so the committed results
document regenerates from the tree alone (round-3 verdict Next #5):

    python tools/assemble_parity_results.py --out PARITY_RESULTS.md

After a new campaign leg, copy its row files from <workdir>/rows/
into parity/rows/ and re-run. Point --v2/--v1 elsewhere to render an
uncommitted campaign's table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nabu_tpu.tools.parity_campaign import CONFIGS  # noqa: E402

HEADER = """# PARITY RESULTS — the five BASELINE configs, end-to-end

No TIMIT/WSJ audio exists in this environment and the reference mount
is empty (SURVEY.md §0), so parity evidence uses the strongest
available proxy: **phone40 v2** — 40 confusable phone-like tokens,
192 train + 12+12 held-out eval speakers with independent F1/F2
vocal-tract warps, high-entropy bigram phonotactics (~4.9 bits/token),
phone-babble + white noise at 5-20 dB SNR, per-utterance channel tilt
+ synthetic room reverb, 3-10 s utterances at ~11 phones/s; 10 min
dev/test audio, train hours per row in the table (2 h at the original
calibration scale; 20 h for the attention-scale legs — see the LAS
section below). Every row is a real `run data/train/test/decode`
pipeline on the committed recipe's model architecture (TPU v5e rows on
the real chip).

Literature sanity bands (BASELINE.md): TIMIT BLSTM-CTC ~18-20% PER,
WSJ LAS ~10-15% WER. The proxy's absolute numbers are not comparable
1:1 with those corpora; the bar is that each config converges to an
honest nonzero error in a comparable band while sustaining the
benchmarked throughput. The corpus difficulty knobs were calibrated
against measured failure modes, each written up in
`nabu_tpu/tools/synth_corpus.py` docstrings (text entropy vs
transcript rote-learning; speaker count vs speaker memorization;
phones/s vs pyramidal-encoder feasibility; babble SNR vs attention
alignment bootstrapping).
"""

LAS_ANALYSIS = """
## The pure-LAS configs (3/4): the scale experiment and its verdict

Round 3 diagnosed the pure-attention configs' failure at 2 h as
transcript memorization and predicted corpus scale would fix it.
Round 4 ran the experiment (10x the audio: 20 h train, same 192
speakers — ~11,000 unique transcripts) plus an acoustic-attribution
control, and the memorization prediction was HALF right:

- **Memorization is defeated by scale.** The mismatched-audio probe
  (tools/tf_probe.py: teacher-forced accuracy with every utterance
  paired to the WRONG audio) read 0.982 matched / 0.946 mismatched at
  2 h — pure text recall. At 20 h las_timit reads **0.27 / 0.22**
  (gap 0.05) and las_large **0.378 / 0.379** (gap -0.0003): the
  decoders can no longer recite 11k high-entropy transcripts, and
  attention still contributes nothing
  (parity/tf_probe_las_timit_20h.json, tf_probe_las_large_wsj_20h).
- **Alignment still does not bootstrap on v2 acoustics.** las_timit:
  0.925 (2 h) -> 0.872 (20 h); las_large: 0.885 -> 0.912 — flat
  across a 10x scale step, under a 24k/16k-step budget with the
  backoff grace scaled to 60% of it (the first 20 h attempt showed
  the 2 h warmup expiring mid-plateau and restore-best erasing
  progress).
- **The same recipe CONVERGES when the acoustics permit alignment.**
  On phone40 v3 — identical in every knob (entropy, speakers, warps,
  channel, reverb, hours) except the phone-babble at 15-30 dB instead
  of 5-20 — the committed las_timit recipe reaches **0.041 test token
  error** on held-out speakers (28.6k steps, beam-4), and the probe
  flips to listening: **0.968 matched / 0.063 mismatched** (gap
  0.905), 0.949 on held-out-speaker dev
  (parity/tf_probe_las_timit_20h_v3.json).

Verdict: the v2 corpus's interference is babble built from the phone
inventory itself, calibrated so CTC lands in the TIMIT band — and
that same calibration denies a PURE-attention decoder the anchor it
needs to discover alignment unsupervised, at any feasible proxy
scale. The joint config's attention head aligns fine on exactly this
audio once its CTC anchor shapes the shared encoder (0.275 test
error, attention co-scoring the beam); the pure-LAS recipe aligns
fine the moment the babble relaxes. Real pure-LAS reference corpora
(WSJ) are clean read speech, far closer to v3 than v2. The framework
implements LAS correctly; the v2 proxy is simply past the measured
boundary of what unsupervised attention alignment tolerates —
which is now a documented property of the corpus, with the boundary
itself located by experiment (5-20 dB: no bootstrap; 15-30 dB: 4.1%
error).

The full evidence chain is committed: per-run rows in parity/rows/,
probe outputs in parity/, the probe as a reproducible command
(tools/tf_probe.py), and every difficulty knob's measured failure
mode in synth_corpus.py docstrings.
"""

NOTES = """
Notes:
- decode RTF is `run decode`'s steady-state number over the test
  split: per-batch recognizer wall time with the one compile-carrying
  call per batch shape excluded (the remote compile service bills
  minutes of wall-clock for microseconds of decode). Kernel-level
  decode RTFs are in README Benchmarks.
- † wall-clock fallback: every batch shape decoded exactly once, so
  the number includes model build + jit compile; not comparable with
  steady-state rows.
- config 1's cpu row (BASELINE.json:7): ~5 h of 2-core CPU across
  three runs — a 60-epoch run killed by a tooling timeout at step
  2,400/2,580 (since fixed; dev trajectory 0.91 -> 0.66 -> 0.41 ->
  0.25 at 500-step validations), then two warm-started continuations
  from each best checkpoint (0.191 -> 0.173 -> 0.162 -> 0.156 ->
  0.142 dev), wall-clock-stopped at 3,600 total optimizer steps. The
  scored best model reads 0.1053 test error — statistically identical
  to the TPU row's 0.1039: full CPU capability, not just
  runnability.
- the multihost-cpu row (config 5) runs the committed recipe via
  `run train --distributed` with 2 real jax.distributed processes:
  disjoint host data shards, GSPMD gradient psum, chief-broadcast
  early stopping, chief-only checkpoints; both workers must finish in
  lockstep at the same step count (BASELINE.json:11). A longer
  upgrade of this leg (campaign --multihost_steps, with a
  material-loss-fall assertion) was attempted FOUR times in round 4
  and showed loss falling (53.3 -> 49.6 over its first 20 steps) but
  never finished inside the round: two 40M-param lockstep workers run
  at 10-110 s/step on this 2-core host, and under load the attempts
  variously hit a Gloo connect timeout and a coordination-service
  barrier failure — the leg needs either real multi-host hardware or
  an idle many-core host. Lockstep numerics are continuously covered
  by tests/test_distributed.py (two real processes, every suite run)
  and tests/test_parallel.py::TestDataParallelEquivalence (sharded
  grads == single-device).
- train audio-s/s is the trainer's own steady-state metric (median of
  the second half of logged windows) and includes bucket padding
  waste, validation pauses, host IO overlap — and, for rows trained
  while other campaign legs shared the 2-core host, loader
  contention; single-chip kernel throughput is benchmarked separately
  in README (bench.py).
"""

V1_APPENDIX = """
## Appendix: round-2 rows on phone40 v1 (recovered)

The round-2 campaign ran on phone40 **v1** (24 speakers, scalar warps,
white noise at 10-30 dB, low-entropy bigram). Those runs finished on
the chip but their rows were stranded un-committed; `--backfill`
recovered them from the surviving expdirs. v1 turned out miscalibrated
in both directions — too easy acoustically for CTC (3.7% vs the 18-20%
TIMIT band) and its low-entropy texts let attention decoders
rote-learn transcripts instead of listening (las_timit collapsed).
Both defects drove the v2 redesign above. Kept for provenance:
"""


def _table(rows):
    lines = [
        "| Config | Platform | Corpus | Test token error |"
        " Train audio-s/s | Steps | Train wall (s) | Decode RTF |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        err = "-" if r["test_error"] is None else f"{r['test_error']:.4f}"
        rtf = "-" if r.get("decode_rtf") is None else f"{r['decode_rtf']}"
        if r.get("rtf_kind") == "wall":
            rtf += " †"
        corpus = (
            f"v{r.get('corpus_version', 2)} "
            f"{r.get('corpus_h', 2.0):g}h"
        )
        lines.append(
            f"| {r['config']} | {r['platform']} | {corpus} | {err} | "
            f"{r['train_audio_s_per_s']} | {r['steps']} | "
            f"{r['train_wall_s']} | {rtf} |"
        )
    return "\n".join(lines)


def _load(rows_dir):
    rows = []
    if rows_dir and os.path.isdir(rows_dir):
        for fname in sorted(os.listdir(rows_dir)):
            if fname.endswith(".json"):
                rows.append(json.load(open(os.path.join(rows_dir, fname))))
    order = {"tpu": 0, "cpu": 1, "multihost-cpu": 2}
    rows.sort(key=lambda r: (
        CONFIGS.index(r["config"]) if r["config"] in CONFIGS else 99,
        r.get("corpus_h", 2.0),
        order.get(r.get("platform"), 9),
    ))
    return rows


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="assemble_parity_results")
    p.add_argument("--v2", default=os.path.join(_REPO, "parity", "rows"),
                   help="v2 rows dir (default: committed parity/rows)")
    p.add_argument("--v1", default=os.path.join(_REPO, "parity",
                                                "rows_v1"),
                   help="v1 recovered rows dir (default: committed)")
    p.add_argument("--out", default="PARITY_RESULTS.md")
    p.add_argument("--pending", nargs="*", default=[],
                   help="configs whose v2 runs were still in flight "
                        "at commit time (listed as pending)")
    args = p.parse_args(argv)

    parts = [HEADER, _table(_load(args.v2))]
    if args.pending:
        parts.append(
            "\nIn flight at commit time (the campaign reruns them with "
            "`--resume`; rows land in a follow-up commit): "
            + ", ".join(args.pending) + "."
        )
    parts.append(NOTES)
    parts.append(LAS_ANALYSIS)
    v1_rows = _load(args.v1) if args.v1 else []
    if v1_rows:
        parts.append(V1_APPENDIX)
        parts.append(_table(v1_rows))
        parts.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
