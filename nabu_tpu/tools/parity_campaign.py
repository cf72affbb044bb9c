"""Parity-results campaign: drive every BASELINE config end-to-end on
the hard synthetic proxy corpus and write PARITY_RESULTS.md.

No TIMIT/WSJ audio exists in this environment (and the reference mount
is empty — SURVEY.md §0), so parity evidence comes from the strongest
available proxy (round-1 verdict Next #1): the ``phone40`` corpus
(tools/synth_corpus.py) — 40 confusable phone-like tokens, held-out
speakers with formant warps, bigram phonotactics, coarticulation
crossfades, 10-30 dB SNR, 3-10 s utterances, hours of audio — run
through the REAL ``run data/train/test/decode`` pipeline with each
BASELINE config's committed model architecture.

    python -m nabu_tpu.tools.parity_campaign --out /tmp/parity \
        [--configs ctc_blstm_timit dblstm_ctc_wsj ...] [--cpu_config1]

Per config it reports: final test token error rate, steady-state train
audio-s/s (from the trainer's own metrics), decode RTF, optimizer
steps and wall-clock. Each stage runs in a fresh subprocess (one TPU
process at a time; the compilation cache keeps restarts cheap).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

from nabu_tpu.config import ConfigFile, Recipe

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# the five BASELINE.json configs (BASELINE.json:6-12), by recipe name
CONFIGS = [
    "ctc_blstm_timit",
    "dblstm_ctc_wsj",
    "las_timit",
    "las_large_wsj",
    "joint_ctc_att_multihost",
]

# feature-processing keys carried over from the committed recipes,
# PER SPLIT — speed_perturb only exists on trainfeatures sections, so
# eval splits never get perturbed
_FEATURE_KEYS = (
    "processor", "feature", "nfilt", "winlen", "winstep", "nfft",
    "include_energy", "dynamic", "lowfreq", "highfreq",
    "speed_perturb",
)


def build_campaign_recipe(
    src_recipe: str,
    out_dir: str,
    splits: dict,
    alphabet,
    trainer_overrides: dict,
    batch_size: int | None = None,
) -> str:
    """A recipe dir = the committed config's model/trainer architecture
    pointed at the proxy corpus (phone targets, word tokenizer)."""
    os.makedirs(out_dir, exist_ok=True)
    src = Recipe(src_recipe)

    db_lines = []
    for split, (scp, text) in splits.items():
        fsec = src.database.section(f"{split}features")
        keys = [
            f"{k} = {fsec[k]}" for k in _FEATURE_KEYS if fsec.get(k)
        ]
        db_lines.append(
            f"[{split}features]\ndatafile = {scp}\n"
            f"dir = {split}features\n" + "\n".join(keys) + "\n"
        )
        # targets mirror the features' speed_perturb (id replication
        # with identical labels) — the loader pairs by utterance id
        tsec = src.database.section(f"{split}targets")
        sp = tsec.get("speed_perturb")
        db_lines.append(
            f"[{split}targets]\ndatafile = {text}\n"
            f"dir = {split}targets\nprocessor = text\n"
            f"tokenizer = word\nalphabet = {' '.join(alphabet)}\n"
            + (f"speed_perturb = {sp}\n" if sp else "")
        )
    with open(os.path.join(out_dir, "database.conf"), "w") as f:
        f.write("\n".join(db_lines))

    # model architecture verbatim
    with open(os.path.join(src_recipe, "model.cfg")) as f:
        model_text = f.read()
    with open(os.path.join(out_dir, "model.cfg"), "w") as f:
        f.write(model_text)

    tconf = src.trainer.section("trainer").copy()
    for k, v in trainer_overrides.items():
        tconf.set(k, str(v))
    if batch_size is not None:
        tconf.set("batch_size", str(batch_size))
    ConfigFile({"trainer": tconf}).write(
        os.path.join(out_dir, "trainer.cfg")
    )

    for fname, maxbatch in (
        ("validation_evaluator.cfg", 32),
        ("test_evaluator.cfg", 32),
        ("recognizer.cfg", 32),
    ):
        cfg = ConfigFile.read(os.path.join(src_recipe, fname))
        sec = cfg.section(cfg.sections()[0])
        if batch_size is not None and sec.get("batch_size"):
            sec.set("batch_size", str(min(batch_size, maxbatch)))
        cfg.write(os.path.join(out_dir, fname))
    return out_dir


def _run(cmd, env=None, timeout_s=7200):
    t0 = time.time()
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    proc = subprocess.run(
        cmd, cwd=REPO, env=full_env, timeout=timeout_s,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    elapsed = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)} failed ({proc.returncode}):\n"
            + proc.stdout[-4000:]
        )
    return proc.stdout, elapsed


def _train_metrics(expdir: str):
    """(median steady-state audio_s/s, last step, logged wall span)
    from metrics.jsonl."""
    rates, last_step = [], 0
    times = []
    with open(os.path.join(expdir, "logs", "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if "time" in m:
                times.append(m["time"])
            if "train/audio_s_per_s" in m:
                rates.append(m["train/audio_s_per_s"])
                last_step = max(last_step, m.get("step", 0))
    rates = rates[len(rates) // 2:] or [0.0]
    span = (max(times) - min(times)) if len(times) > 1 else 0.0
    return sorted(rates)[len(rates) // 2], last_step, span


def _test_audio_seconds(expdir: str) -> float:
    meta = json.load(open(os.path.join(
        expdir, "data", "testfeatures", "metadata.json"
    )))
    # frames * 10 ms
    return meta["num_utts"] * meta["mean_length"] * 0.01


def run_config(name: str, splits, alphabet, workdir: str,
               platform: str | None = None, quick: bool = False,
               quick_epochs: int = 2, resume: bool = False,
               train_seconds: float = 7200.0, corpus_version: int = 2,
               num_epochs: int | None = None):
    """data -> train -> test -> decode for one BASELINE config.

    ``resume`` skips stages whose outputs already exist in the expdir
    (data: prepared metadata; train: a best checkpoint + metrics;
    test: test_result.json), so a campaign interrupted mid-way — the
    TPU tunnel can wedge for an hour (CLAUDE.md) — restarts where it
    stopped. Decode always re-runs (cheap, and it is the RTF probe)."""
    overrides = {
        # keep the recipes' committed validation cadence (500/1000
        # steps) and early-stopping semantics. A first campaign run
        # overrode valid_frequency down to 200 "because the corpus is
        # small" — that trapped the attention configs: the dev loss
        # plateaus while attention aligns (the classic LAS plateau),
        # every 200-step non-improvement fired restore-best + LR
        # backoff, and the LR collapsed 6 halvings before the model
        # could break through (las_timit ended at 113% test error).
        "ckpt_frequency": 0,
        "log_frequency": 20,
        "num_buckets": 4,
        # comparable STEP budget, every config: the 2 h proxy at B=32
        # gives ~51 steps/epoch vs ~115 on TIMIT / thousands on WSJ,
        # so the recipes' committed epoch counts undertrain here by
        # 2-4x (config 1 on corpus v2 read 37% test error with dev
        # error still falling ~8 points per 500 steps at its budget).
        # 120 epochs ~= 6,200 steps at B=32 — TIMIT-recipe scale —
        # and early stopping + LR backoff (committed semantics, kept)
        # decide actual convergence below that ceiling.
        "num_epochs": 120,
    }
    if name in ("las_timit", "las_large_wsj",
                "joint_ctc_att_multihost"):
        # attention recipes additionally need: a slower validation
        # cadence, the sortagrad curriculum (shortest utterances
        # first in epoch 0), a backoff GRACE PERIOD, and headroom
        # beyond it. Measured on corpus v2: las_timit's alignment
        # plateau lasted ~5,000 steps — validation CE sat at ~2.2
        # while the LR backed off 4x and early stopping restored the
        # pre-alignment step-1000 model at step 5000, the exact
        # moment teacher-forced accuracy jumped 0.30 -> 0.41. The
        # warmup suspends restore/backoff/stop (not best-tracking)
        # until alignment can break through; early stopping governs
        # the tail as committed.
        overrides["valid_frequency"] = 1000
        overrides["sortagrad"] = "true"
        # 3-way speed perturbation triples steps/epoch, so the epoch
        # ceilings below keep the same ~9k-step budget
        if name == "las_timit":  # B=32: ~154 steps/epoch perturbed
            overrides["num_epochs"] = 60
            overrides["backoff_warmup_steps"] = 6000
        else:  # B=64: ~77 steps/epoch perturbed
            overrides["num_epochs"] = 120
            overrides["backoff_warmup_steps"] = 4000
        if train_seconds > 1.5 * 7200.0:
            # scaled corpus (round-3 verdict Next #1: the 2 h proxy is
            # too small for pure-attention configs — the speller
            # rote-learns the ~1,100 transcripts instead of
            # listening). Keep an absolute STEP target rather than the
            # 2 h epoch ceilings: at 20 h one perturbed epoch is
            # ~10-30x more steps, so the 2 h ceilings would either
            # overshoot 10x or undertrain. ~6.5 s mean utterance
            # (uniform 3-10 s), 3-way speed perturbation triples
            # steps/epoch.
            src_t = Recipe(os.path.join(
                REPO, "config", "recipes", name
            )).trainer.section("trainer")
            batch = int(src_t.get("batch_size", "32"))
            steps_per_epoch = 3.0 * train_seconds / (batch * 6.5)
            # las_large's B=64 budget is additionally capped by the
            # axon client's staging-buffer leak (~transferred bytes
            # retained per step, measured in trainer.py): its first
            # 20k-step attempt was OOM-killed at 127 GB host RSS
            # around step 9.4k; bf16 feature shipping halves the rate
            # and 16k steps keeps peak RSS ~90 GB on a 125 GB host
            target_steps = 24000 if name == "las_timit" else 16000
            overrides["num_epochs"] = max(
                6, round(target_steps / steps_per_epoch)
            )
            # the backoff grace must scale WITH the step budget: on
            # the first 20 h run the 2 h warmup (6,000 of 24,000
            # steps) expired mid-plateau — dev error sat at ~0.89
            # around step 11-13k while alignment was still forming,
            # and restore-best + LR backoff + early stopping would
            # have killed the run at ~15k exactly as the 2 h
            # diagnosis predicts. 60% of the budget keeps the same
            # proportion the 2 h recipes were tuned to.
            overrides["backoff_warmup_steps"] = int(0.6 * target_steps)
    if num_epochs is not None:
        overrides["num_epochs"] = num_epochs
    if quick:
        overrides["num_epochs"] = quick_epochs
        overrides["valid_frequency"] = 0
    recipe = build_campaign_recipe(
        os.path.join(REPO, "config", "recipes", name),
        os.path.join(workdir, f"recipe_{name}"),
        splits, alphabet, overrides,
    )
    expdir = os.path.join(workdir, f"exp_{name}" + (
        f"_{platform}" if platform else ""
    ))
    if os.path.exists(expdir) and not resume:
        import shutil

        shutil.rmtree(expdir)  # stale metrics/checkpoints would mix in
    env = {}
    if platform:
        env["NABU_PLATFORM"] = platform
    elif os.environ.get("NABU_PLATFORM"):
        platform = os.environ["NABU_PLATFORM"]  # label only
    runner = ["bash", os.path.join(REPO, "run")]

    data_done = os.path.exists(os.path.join(
        expdir, "data", "testfeatures", "metadata.json"
    ))
    if resume and data_done:
        print(f"[campaign] {name}: data (skipped, exists)", flush=True)
    else:
        print(f"[campaign] {name}: data", flush=True)
        _run(runner + ["data", f"--recipe={recipe}",
                       f"--expdir={expdir}", "--num_workers=8"], env)
    # `run train` writes logs/train_complete.json only when training
    # actually finished (its absence means killed mid-run — the exact
    # case --resume exists for), so a half-trained model is re-trained
    # instead of silently reported as a converged result
    train_done = os.path.exists(
        os.path.join(expdir, "logs", "train_complete.json")
    )
    if resume and train_done:
        print(f"[campaign] {name}: train (skipped, exists)", flush=True)
        audio_rate, steps, train_wall = _train_metrics(expdir)
    else:
        print(f"[campaign] {name}: train", flush=True)
        # a 2-core CPU leg legitimately trains for many hours — the
        # default 2 h subprocess timeout killed a convergence run 180
        # steps from its ceiling (round-4); only TPU legs keep the
        # tight timeout (there a silent 2 h hang means the tunnel
        # wedged and the watchdog should get its chance)
        _, train_wall = _run(
            runner + ["train", f"--recipe={recipe}",
                      f"--expdir={expdir}"],
            env,
            timeout_s=86400 if platform == "cpu" else 7200,
        )
        audio_rate, steps, _ = _train_metrics(expdir)
    result_path = os.path.join(expdir, "test_result.json")
    if resume and os.path.exists(result_path):
        print(f"[campaign] {name}: test (skipped, exists)", flush=True)
    else:
        print(f"[campaign] {name}: test", flush=True)
        _run(runner + ["test", f"--recipe={recipe}",
                       f"--expdir={expdir}"], env)
    err = json.load(open(result_path))["metric"]
    print(f"[campaign] {name}: decode", flush=True)
    decode_out, decode_wall = _run(
        runner + ["decode", f"--recipe={recipe}", f"--expdir={expdir}"],
        env,
    )
    # prefer the decode script's steady-state RTF (compile calls
    # excluded — a remote compile service bills minutes of wall-clock
    # for microseconds of decode); fall back to total wall-clock
    import re as _re

    m = _re.search(r"steady-state RTF ([0-9.eE+-]+)", decode_out)
    if m:
        rtf, rtf_kind = float(m.group(1)), "steady"
    else:
        rtf = decode_wall / max(_test_audio_seconds(expdir), 1e-9)
        rtf_kind = "wall"  # includes model build + jit compile
    return {
        "config": name,
        "platform": platform or "tpu",
        "corpus_h": round(train_seconds / 3600.0, 1),
        "corpus_version": corpus_version,
        "test_error": err,
        "train_audio_s_per_s": round(audio_rate, 1),
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "decode_rtf": round(rtf, 5),
        "rtf_kind": rtf_kind,
    }


def run_config5_multihost_cpu(splits, alphabet, workdir: str,
                              resume: bool = False,
                              num_steps: int = 300):
    """Config 5 trained by TWO real jax.distributed CPU processes
    (BASELINE.json:11 'multi-host data-parallel') on the proxy corpus:
    each process loads a disjoint host shard, GSPMD psums gradients,
    the chief writes metrics/checkpoints, and early stopping is
    chief-broadcast. A short lockstep/correctness leg (both processes
    must agree on every step count and global loss), not a convergence
    run; test runs single-process on the shared expdir. Decode is
    skipped (attention beam decode of the full test split on a 2-core
    host adds tens of minutes for no extra evidence)."""
    import socket
    import textwrap

    name = "joint_ctc_att_multihost"
    # round-3 verdict Next #6: 24 steps could only assert mechanics
    # (lockstep, disjoint shards, chief-only writes) — slow divergence
    # (e.g. a subtly wrong psum average) needs loss visibly falling
    # over hundreds of steps plus a validation improvement, so this
    # leg now trains 300 steps and asserts the training loss dropped
    # materially.
    overrides = {
        "ckpt_frequency": 0, "log_frequency": 10, "num_buckets": 2,
        "num_steps": num_steps,
        "valid_frequency": max(20, num_steps // 3),
        "warmup_steps": 40,
        "async_checkpoint": "false",
    }
    recipe = build_campaign_recipe(
        os.path.join(REPO, "config", "recipes", name),
        os.path.join(workdir, f"recipe_{name}_mh"),
        splits, alphabet, overrides, batch_size=8,
    )
    expdir = os.path.join(workdir, f"exp_{name}_multihost-cpu")
    result_path = os.path.join(expdir, "test_result.json")
    train_done = os.path.exists(
        os.path.join(expdir, "logs", "train_complete.json")
    )
    if not (resume and train_done):
        if os.path.exists(expdir):
            import shutil

            shutil.rmtree(expdir)
        print(f"[campaign] {name}: data (multihost-cpu)", flush=True)
        env = {"NABU_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}
        _run(["bash", os.path.join(REPO, "run"), "data",
              f"--recipe={recipe}", f"--expdir={expdir}",
              "--num_workers=4"], env)
        print(f"[campaign] {name}: train (2 processes)", flush=True)
        s = socket.socket()
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"
        s.close()
        worker = textwrap.dedent(f"""
            import os, sys
            os.environ["JAX_PLATFORMS"] = "cpu"
            import jax
            jax.config.update("jax_platforms", "cpu")
            sys.path.insert(0, {REPO!r})
            from nabu_tpu.scripts import train
            r = train.main(
                {recipe!r}, {expdir!r}, distributed=True,
                coordinator={coord!r}, num_processes=2,
                process_id=int(sys.argv[1]),
            )
            print("WORKER_DONE", sys.argv[1], r["step"],
                  round(float(r["best_metric"]), 6))
        """)
        t0 = time.time()
        env_full = dict(os.environ)
        env_full.pop("XLA_FLAGS", None)
        env_full.update(env)
        # per-worker output FILES, not pipes: draining two lockstep
        # workers' pipes sequentially is a latent deadlock — if worker
        # 1 fills its 64 KB pipe while communicate() is still on
        # worker 0, worker 1 blocks on write and stalls worker 0's
        # collectives until the timeout (round-3 advisor finding).
        out_paths = [
            os.path.join(workdir, f"mh_worker{r}.log") for r in range(2)
        ]
        out_files = [open(p, "w") for p in out_paths]
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", worker, str(r)], cwd=REPO,
                env=env_full, stdout=out_files[r],
                stderr=subprocess.STDOUT, text=True,
            )
            for r in range(2)
        ]
        deadline = time.time() + 3600
        for p in procs:
            p.wait(timeout=max(1.0, deadline - time.time()))
        for f in out_files:
            f.close()
        outs = [open(p).read() for p in out_paths]
        train_wall = time.time() - t0
        for r, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(
                    f"multihost worker {r} failed:\n" + out[-4000:]
                )
        # lockstep: both workers finished the same step count
        import re as _re

        steps_seen = set()
        for r, out in enumerate(outs):
            m = _re.search(rf"WORKER_DONE {r} (\d+)", out)
            if not m:
                raise RuntimeError(
                    f"worker {r} never reported DONE:\n" + out[-4000:]
                )
            steps_seen.add(int(m.group(1)))
        if len(steps_seen) != 1:
            raise RuntimeError(f"workers disagree on steps: {steps_seen}")
    else:
        print(f"[campaign] {name}: multihost-cpu train (skipped, "
              "exists)", flush=True)
        _, _, train_wall = _train_metrics(expdir)
    # training loss must FALL materially over the 300 lockstep steps —
    # a subtly wrong gradient psum (e.g. sum instead of mean, or one
    # worker's shard dropped) still keeps perfect lockstep, but the
    # effective 2x/0.5x learning rate or half-data signal shows up as
    # a loss curve that stalls or diverges vs the single-process run
    losses = []
    with open(os.path.join(expdir, "logs", "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if "train/loss" in m:
                losses.append((m.get("step", 0), m["train/loss"]))
    losses.sort()
    if len(losses) < 3:
        raise RuntimeError("multihost leg logged <3 loss points")
    first, last = losses[0][1], losses[-1][1]
    if not last < 0.85 * first:
        raise RuntimeError(
            f"multihost training loss did not fall materially: "
            f"{first:.4f} -> {last:.4f} over {losses[-1][0]} steps"
        )
    print(f"[campaign] {name}: multihost loss {first:.4f} -> "
          f"{last:.4f} over {losses[-1][0]} steps", flush=True)
    # gate the test stage on its own output, independent of train_done:
    # a run killed between train and test must re-test on --resume, not
    # crash on a missing test_result.json (round-3 advisor finding)
    if not (resume and os.path.exists(result_path)):
        print(f"[campaign] {name}: test (multihost-cpu)", flush=True)
        _run(["bash", os.path.join(REPO, "run"), "test",
              f"--recipe={recipe}", f"--expdir={expdir}"],
             {"NABU_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"})
    audio_rate, steps, _ = _train_metrics(expdir)
    err = json.load(open(result_path))["metric"]
    return {
        "config": name,
        "platform": "multihost-cpu",
        "corpus_h": 2.0,
        "test_error": err,
        "train_audio_s_per_s": round(audio_rate, 1),
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "decode_rtf": None,
        "rtf_kind": "skipped",
    }


def backfill_row(name: str, workdir: str, platform: str = "tpu"):
    """Assemble a results row from an EXISTING completed expdir without
    re-running anything (recovers results stranded by an interrupted
    campaign — the row-persistence machinery landed after the round-2
    TPU runs finished, so their test_result.json/metrics were never
    turned into rows). Returns None when the expdir lacks a final
    test_result.json."""
    expdir = os.path.join(workdir, f"exp_{name}" + (
        "" if platform == "tpu" else f"_{platform}"
    ))
    result_path = os.path.join(expdir, "test_result.json")
    if not os.path.exists(result_path):
        return None
    err = json.load(open(result_path))["metric"]
    audio_rate, steps, span = _train_metrics(expdir)
    return {
        "config": name,
        "platform": platform,
        "test_error": err,
        "train_audio_s_per_s": round(audio_rate, 1),
        "steps": steps,
        "train_wall_s": round(span, 1),
        "decode_rtf": None,
        "rtf_kind": "backfill",
    }


def row_filename(row: dict) -> str:
    """Row files are keyed by config x platform x corpus scale x
    corpus version: a 20 h (or v3-acoustics) las row must not
    overwrite the 2 h v2 row it is being compared against."""
    h = row.get("corpus_h", 2.0)
    v = row.get("corpus_version", 2)
    tag = "" if h == 2.0 else f"_{h:g}h"
    vtag = "" if v == 2 else f"_v{v}"
    return f"{row['config']}_{row['platform']}{tag}{vtag}.json"


def write_results(path: str, rows, corpus_desc: str) -> None:
    lines = [
        "# PARITY RESULTS — BASELINE configs on the phone40 proxy corpus",
        "",
        "The environment has no TIMIT/WSJ audio and the reference mount is",
        "empty (SURVEY.md §0), so parity evidence uses the strongest",
        "available proxy: " + corpus_desc,
        "",
        "Literature sanity bands (BASELINE.md): TIMIT BLSTM-CTC ~18-20% PER,",
        "WSJ LAS ~10-15% WER. The proxy's absolute numbers are not",
        "comparable 1:1, but the configs must land in an honest nonzero",
        "error band, converge, and sustain the benchmarked throughput.",
        "",
        "| Config | Platform | Corpus | Test token error |"
        " Train audio-s/s | Steps | Train wall (s) | Decode RTF |",
        "|---|---|---|---|---|---|---|---|",
    ]
    any_wall = False
    for r in rows:
        err = "-" if r["test_error"] is None else f"{r['test_error']:.4f}"
        rtf = f"{r['decode_rtf']}" if r.get("decode_rtf") is not None else "-"
        # per-row provenance: steady-state (compile excluded) is the
        # honest number; a wall-clock fallback (model build + jit
        # INCLUDED) is marked so one column never silently means two
        # different things across rows
        if r.get("rtf_kind") == "wall":
            rtf += " †"
            any_wall = True
        corpus = (
            f"v{r.get('corpus_version', 2)} "
            f"{r.get('corpus_h', 2.0):g}h"
        )
        lines.append(
            f"| {r['config']} | {r['platform']} | {corpus} | {err} | "
            f"{r['train_audio_s_per_s']} | {r['steps']} | "
            f"{r['train_wall_s']} | {rtf} |"
        )
    lines += [
        "",
        "Notes:",
        "- decode RTF is the decode script's steady-state number over",
        "  the test split: per-batch recognizer wall time with the one",
        "  compile-carrying call per batch shape excluded (a remote",
        "  compile service bills minutes of wall-clock for microseconds",
        "  of decode). Kernel-level decode RTF is in README Benchmarks.",
    ]
    if any_wall:
        lines += [
            "- † wall-clock fallback: every batch shape decoded exactly",
            "  once, so the number is total `run decode` wall time /",
            "  test audio seconds — model build and jit compile",
            "  INCLUDED; not comparable with steady-state rows.",
        ]
    lines += [
        "- the CPU row for config 1 proves CPU-runnability",
        "  (BASELINE.json:7): a short run, not full convergence.",
        "- the multihost-cpu row runs the committed config-5 recipe via",
        "  `run train --distributed` with 2 real jax.distributed",
        "  processes on the host (BASELINE.json:11): disjoint host data",
        "  shards, GSPMD gradient psum, chief-only checkpoints.",
        "- train audio-s/s is the trainer's own steady-state metric",
        "  (median of the second half of logged windows), which includes",
        "  bucket padding waste, validation pauses and host IO overlap.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="parity_campaign", description=__doc__
    )
    p.add_argument("--out", required=True)
    p.add_argument("--configs", nargs="*", default=CONFIGS,
                   choices=CONFIGS,
                   help="subset of the five BASELINE configs (a name "
                        "outside this list would persist a row the "
                        "table assembly can't attribute)")
    p.add_argument("--train_seconds", type=float, default=7200.0)
    p.add_argument("--eval_seconds", type=float, default=600.0)
    p.add_argument("--corpus_version", type=int, default=2,
                   choices=[1, 2, 3],
                   help="phone40 profile: v2 adds phone-babble + white "
                        "noise at 5-20 dB SNR, channel tilt + reverb, "
                        "and independent per-speaker F1/F2 warps "
                        "(round-2 verdict Next #3: v1 under-stressed "
                        "acoustics — CTC landed at 3.7%% vs the "
                        "18-20%% TIMIT band); v3 = v2 with babble at "
                        "15-30 dB (the attention-bootstrap attribution "
                        "variant — see synth_corpus.py); all keep "
                        "~11 phones/s")
    p.add_argument("--cpu_config1", action="store_true",
                   help="also run config 1 on CPU (short run)")
    p.add_argument("--cpu_config1_full", action="store_true",
                   help="run config 1 on CPU to its early-stopped "
                        "convergence (hours of 2-core CPU; round-3 "
                        "verdict Next #4 — the quick leg proves "
                        "runnability, this one proves capability)")
    p.add_argument("--cpu_full_epochs", type=int, default=120,
                   help="epoch ceiling for --cpu_config1_full (the "
                        "TPU row uses 120; a 2-core host may need a "
                        "smaller ceiling to finish in wall-clock — "
                        "the row records the actual steps)")
    p.add_argument("--multihost_config5", action="store_true",
                   help="also run config 5 with 2 real jax.distributed "
                        "CPU processes (lockstep leg)")
    p.add_argument("--multihost_steps", type=int, default=300,
                   help="steps for the multihost leg (a 2-core host "
                        "runs the two 40M-param lockstep workers at "
                        "~5-15 s/step; size to wall-clock)")
    p.add_argument("--backfill", action="store_true",
                   help="before running anything, synthesize rows from "
                        "existing completed expdirs that predate row "
                        "persistence (never overwrites a live row)")
    p.add_argument("--smoke", action="store_true",
                   help="2-epoch runs for every config (machinery "
                        "check, not a results run)")
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose outputs already exist "
                        "(restart an interrupted campaign)")
    p.add_argument("--results", default=None,
                   help="PARITY_RESULTS.md path (default <out>/...)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from nabu_tpu.tools.synth_corpus import make_phone40_corpus

    corpus_dir = os.path.join(args.out, "corpus")
    marker = os.path.join(corpus_dir, ".complete")
    # the marker records the corpus version: reusing a v1 corpus for a
    # v2 campaign (or vice versa) would silently mix difficulty levels
    # an empty marker is NOT a valid corpus: a crash mid-write leaves
    # a created-but-empty file, and accepting it would silently reuse
    # a possibly incomplete corpus (round-3 advisor finding). Only the
    # exact version string counts ("ok" is the legacy v1 spelling).
    accepted = {f"v{args.corpus_version}"}
    if args.corpus_version == 1:
        accepted.add("ok")
    marker_ok = (
        os.path.exists(marker)
        and open(marker).read().strip() in accepted
    )
    if marker_ok:
        splits = {
            s: (os.path.join(corpus_dir, s, "wav.scp"),
                os.path.join(corpus_dir, s, "text"))
            for s in ("train", "dev", "test")
        }
        from nabu_tpu.tools.synth_corpus import _phone40_inventory

        alphabet = [ph["name"] for ph in _phone40_inventory()]
        print("[campaign] reusing corpus", flush=True)
    else:
        print(f"[campaign] synthesizing phone40 v{args.corpus_version} "
              "corpus", flush=True)
        splits, alphabet = make_phone40_corpus(
            corpus_dir,
            train_seconds=args.train_seconds,
            dev_seconds=args.eval_seconds,
            test_seconds=args.eval_seconds,
            seed=args.seed,
            version=args.corpus_version,
        )
        open(marker, "w").write(f"v{args.corpus_version}\n")

    # every finished config persists its row; the table is assembled
    # from ALL persisted rows, so a campaign split across several
    # invocations (or interrupted by a backend wedge) still ends with
    # one complete PARITY_RESULTS.md
    rows_dir = os.path.join(args.out, "rows")
    os.makedirs(rows_dir, exist_ok=True)

    def _save_row(row):
        path = os.path.join(rows_dir, row_filename(row))
        with open(path, "w") as f:
            json.dump(row, f)
        print(json.dumps(row), flush=True)

    if args.backfill:
        for name in CONFIGS:
            for platform in ("tpu", "cpu"):
                path = os.path.join(
                    rows_dir, f"{name}_{platform}.json"
                )
                if os.path.exists(path):
                    continue  # a live row always wins over a backfill
                row = backfill_row(name, args.out, platform)
                if row:
                    _save_row(row)

    for name in args.configs:
        _save_row(run_config(
            name, splits, alphabet, args.out, quick=args.smoke,
            resume=args.resume, train_seconds=args.train_seconds,
            corpus_version=args.corpus_version,
        ))
    if args.cpu_config1:
        _save_row(run_config(
            "ctc_blstm_timit", splits, alphabet, args.out,
            platform="cpu", quick=True, quick_epochs=10,
            resume=args.resume, train_seconds=args.train_seconds,
            corpus_version=args.corpus_version,
        ))
    if args.cpu_config1_full:
        _save_row(run_config(
            "ctc_blstm_timit", splits, alphabet, args.out,
            platform="cpu", resume=args.resume,
            train_seconds=args.train_seconds,
            corpus_version=args.corpus_version,
            num_epochs=args.cpu_full_epochs,
        ))
    if args.multihost_config5:
        _save_row(run_config5_multihost_cpu(
            splits, alphabet, args.out, resume=args.resume,
            num_steps=args.multihost_steps,
        ))

    # assemble from ALL persisted rows (canonical configs in canonical
    # order with tpu before other platforms; anything else — e.g. a row
    # written under an unanticipated platform label — appended after,
    # never silently dropped)
    rows, seen = [], set()
    platform_order = {"tpu": 0, "cpu": 1, "multihost-cpu": 2}

    def _key(fname):
        row = json.load(open(os.path.join(rows_dir, fname)))
        cfg = row.get("config", fname)
        cfg_i = CONFIGS.index(cfg) if cfg in CONFIGS else len(CONFIGS)
        return (cfg_i, row.get("corpus_h", 2.0),
                platform_order.get(row.get("platform"), 9), fname)

    for fname in sorted(os.listdir(rows_dir)):
        if fname.endswith(".json"):
            seen.add(fname)
    for fname in sorted(seen, key=_key):
        rows.append(json.load(open(os.path.join(rows_dir, fname))))

    if args.corpus_version >= 3:
        desc = (
            f"the phone40 v3 corpus ({args.train_seconds / 3600:.1f} h "
            "train: identical to v2 — 40 phone-like tokens, 192+12+12 "
            "speakers with independent F1/F2 warps, ~4.9 bits/token "
            "phonotactics, channel tilt + reverb — except the "
            "phone-babble sits at 15-30 dB SNR instead of 5-20: the "
            "attention-bootstrap attribution variant (see "
            "synth_corpus.py)."
        )
    elif args.corpus_version >= 2:
        desc = (
            f"the phone40 v2 corpus ({args.train_seconds / 3600:.1f} h "
            f"train / {args.eval_seconds / 60:.0f} min dev/test, 40 "
            "phone-like tokens, 192 train + 12+12 held-out eval "
            "speakers with INDEPENDENT F1/F2 vocal-tract warps, "
            "high-entropy bigram phonotactics (~4.9 bits/token), "
            "babble + white noise at 5-20 dB SNR, per-utterance "
            "channel tilt and synthetic room reverb, 3-10 s "
            "utterances at ~11 phones/s)."
        )
    else:
        desc = (
            f"the phone40 corpus ({args.train_seconds / 3600:.1f} h "
            f"train / {args.eval_seconds / 60:.0f} min dev/test, 40 "
            "phone-like tokens, 24 train + 6+6 held-out eval speakers "
            "with vocal-tract warps, bigram phonotactics, 20 ms "
            "coarticulation crossfades, 10-30 dB SNR, 3-10 s "
            "utterances)."
        )
    results = args.results or os.path.join(args.out, "PARITY_RESULTS.md")
    write_results(results, rows, desc)
    print(f"[campaign] wrote {results}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
