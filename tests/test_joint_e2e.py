"""End-to-end joint CTC/attention test (BASELINE config 5 shape,
single host): shared encoder with two heads trains on the tone corpus;
both heads decode the same trained checkpoint."""

import json
import os

import pytest

from tests.corpus_utils import make_corpus, write_recipe

MODEL_CFG = """[model]
decoders = att ctc

[encoder]
encoder = listener
num_layers = 1
num_units = 32

[att]
decoder = speller
num_layers = 1
num_units = 32
embed_dim = 16
loss = cross_entropy
loss_weight = 0.7
label_smoothing = 0.05

[ctc]
decoder = linear_ctc
loss = ctc
loss_weight = 0.3
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 2
num_steps = 500
learning_rate = 4e-3
valid_frequency = 125
log_frequency = 50
num_tries = 8
"""

RECOGNIZER = """recognizer = attention_beam
head = att
beam_width = 4
length_norm_power = 1.0"""


@pytest.fixture(scope="module")
def trained_joint(tmp_path_factory):
    root = tmp_path_factory.mktemp("joint_e2e")
    corpus = {
        "train": make_corpus(str(root / "train"), 72, seed=20, min_len=3,
                             max_len=6),
        "dev": make_corpus(str(root / "dev"), 12, seed=21, min_len=3,
                           max_len=6),
    }
    recipe = str(root / "recipe")
    write_recipe(
        recipe, corpus, MODEL_CFG, TRAINER_CFG,
        recognizer_lines=RECOGNIZER,
    )
    expdir = str(root / "exp")

    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import train as train_script

    data_script.main(recipe, expdir)
    result = train_script.main(recipe, expdir)
    return root, recipe, expdir, result


def test_both_losses_decrease(trained_joint):
    _, _, expdir, _ = trained_joint
    lines = [
        json.loads(l)
        for l in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    att = [l["train/loss/att"] for l in lines if "train/loss/att" in l]
    ctc = [l["train/loss/ctc"] for l in lines if "train/loss/ctc" in l]
    assert att[-1] < att[0] * 0.5, att
    assert ctc[-1] < ctc[0] * 0.5, ctc


def test_attention_head_decodes(trained_joint):
    _, recipe, expdir, _ = trained_joint
    from nabu_tpu.scripts import test as test_script

    metric = test_script.main(recipe, expdir)
    assert metric < 0.35, f"attention head error rate {metric}"


def test_ctc_head_decodes_same_checkpoint(trained_joint):
    """The shared-encoder CTC head decodes from the same params."""
    _, recipe, expdir, _ = trained_joint
    from nabu_tpu.config import Conf, Recipe
    from nabu_tpu.decoding.recognizers import build_recognizer
    from nabu_tpu.decoding.scorer import error_rate
    from nabu_tpu.scripts.common import make_loader, model_from_recipe
    from nabu_tpu.scripts.test import load_best_params

    r = Recipe(recipe)
    model, _ = model_from_recipe(r, expdir, "devfeatures", "devtargets")
    loader, _, _ = make_loader(
        r, expdir,
        Conf({"features": "devfeatures", "targets": "devtargets"}),
        batch_size=8, num_buckets=1,
    )
    params = load_best_params(expdir, model)
    rec = build_recognizer(
        Conf({"recognizer": "ctc_beam", "head": "ctc", "beam_width": "4"}),
        model,
    )
    refs, hyps = [], []
    for batch in loader.epoch(0, shuffle=False):
        out = rec(params, batch.features, batch.feature_lengths)
        for b in range(len(batch.utt_ids)):
            if not batch.example_mask[b]:
                continue
            refs.append(list(batch.targets[b, : batch.target_lengths[b]]))
            hyps.append(out.best(b))
    rate, _, _ = error_rate(refs, hyps)
    assert rate < 0.5, f"ctc head error rate {rate}"


def test_joint_one_pass_decoding(trained_joint):
    """The hybrid CTC/attention beam decodes the trained joint model at
    least as well as either single head (it is the flagship's proper
    decoder)."""
    _, recipe, expdir, _ = trained_joint
    from nabu_tpu.config import Conf, Recipe
    from nabu_tpu.decoding.recognizers import build_recognizer
    from nabu_tpu.decoding.scorer import error_rate
    from nabu_tpu.scripts.common import make_loader, model_from_recipe
    from nabu_tpu.scripts.test import load_best_params

    r = Recipe(recipe)
    model, _ = model_from_recipe(r, expdir, "devfeatures", "devtargets")
    loader, _, _ = make_loader(
        r, expdir,
        Conf({"features": "devfeatures", "targets": "devtargets"}),
        batch_size=8, num_buckets=1,
    )
    params = load_best_params(expdir, model)
    rec = build_recognizer(
        Conf({"recognizer": "joint_beam", "beam_width": "4",
              "ctc_weight": "0.3", "length_norm_power": "1.0"}),
        model,
    )
    refs, hyps = [], []
    for batch in loader.epoch(0, shuffle=False):
        out = rec(params, batch.features, batch.feature_lengths)
        for b in range(len(batch.utt_ids)):
            if not batch.example_mask[b]:
                continue
            refs.append(list(batch.targets[b, : batch.target_lengths[b]]))
            hyps.append(out.best(b))
    rate, _, _ = error_rate(refs, hyps)
    assert rate < 0.35, f"joint decoding error rate {rate}"


def test_run_recognize_on_raw_wavs(trained_joint):
    """`run recognize` decodes wav paths directly (no data prep)."""
    root, recipe, expdir, _ = trained_joint
    from nabu_tpu.scripts import recognize as recognize_script

    scp, text = open(str(root / "dev" / "wav.scp")).readlines()[:2], {}
    wavs = [line.split()[1] for line in scp]
    for line in open(str(root / "dev" / "text")):
        utt, _, t = line.partition(" ")
        text[utt] = t.strip()
    results = recognize_script.main(recipe, expdir, wavs)
    assert len(results) == 2
    correct = sum(text[utt] == hyp for utt, hyp in results)
    assert correct >= 1, results  # trained model: mostly right
