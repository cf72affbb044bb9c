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
## The pure-LAS configs (3/4) vs proxy scale — measured analysis

Configs 3 and 4 (las_timit, las_large_wsj — attention-only decoders)
do not converge to useful free-running error on this proxy, and the
failure is fully diagnosed, instrumented, and attributable to corpus
scale rather than the framework: a mismatched-audio probe (teacher-
forced accuracy with every utterance paired to the WRONG audio) shows
the speller rote-memorizing the training transcripts — las_large at
step 7800 reads 0.982 train TF accuracy with matched audio and 0.946
with mismatched, 0.063 on held-out speakers either way. A 2 h corpus
has only ~1,100 unique transcripts (~400 kb of text at 4.9 bits/
token), trivially within a WSJ-scale decoder's capacity, so
memorizing text is always cheaper for the optimizer than listening;
these architectures' reference corpora are 30-80 h for a reason. The
joint CTC/attention flagship (config 5) escapes exactly as the
literature predicts: its CTC head forces the shared encoder to carry
phone evidence and co-scores the beam, and it converges to 27% here.
The diagnosis trail (text entropy, speaker count, augmentation,
scheduled sampling, decode-based validation, backoff warmup) is
recorded in synth_corpus.py/the recipes' comments, and every
mitigation it motivated is committed and tested.
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
- the cpu row (config 1) proves CPU-runnability (BASELINE.json:7):
  a short run, not full convergence.
- the multihost-cpu row (config 5) runs the committed recipe via
  `run train --distributed` with 2 real jax.distributed processes:
  disjoint host data shards, GSPMD gradient psum, chief-broadcast
  early stopping, chief-only checkpoints; both workers must finish in
  lockstep at the same step count (BASELINE.json:11).
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
