"""End-to-end LAS (listener + attention speller) integration test
(BASELINE config 3 shape): the attention path must learn the tone task
and decode with attention beam search."""

import json
import os

import pytest

from tests.corpus_utils import make_corpus, write_recipe

MODEL_CFG = """[encoder]
encoder = listener
num_layers = 1
num_units = 32

[decoder]
decoder = speller
num_layers = 1
num_units = 32
embed_dim = 16
attention = bahdanau
sample_prob = 0.1
loss = cross_entropy
label_smoothing = 0.05
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 2
num_steps = 500
learning_rate = 4e-3
clip_grad_norm = 5.0
valid_frequency = 125
log_frequency = 50
num_tries = 8
early_stopping = true
"""

RECOGNIZER = """recognizer = attention_beam
beam_width = 4
length_norm_power = 1.0"""


@pytest.fixture(scope="module")
def trained_las(tmp_path_factory):
    root = tmp_path_factory.mktemp("las_e2e")
    corpus = {
        # longer utterances so the pyramid still leaves enough frames
        "train": make_corpus(str(root / "train"), 72, seed=10, min_len=3,
                             max_len=6),
        "dev": make_corpus(str(root / "dev"), 12, seed=11, min_len=3,
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


def test_las_learns(trained_las):
    _, _, expdir, result = trained_las
    lines = [
        json.loads(l)
        for l in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    accs = [
        l["train/decoder/token_accuracy"]
        for l in lines
        if "train/decoder/token_accuracy" in l
    ]
    assert accs[-1] > 0.8, accs


def test_las_beam_decode(trained_las):
    _, recipe, expdir, _ = trained_las
    from nabu_tpu.scripts import test as test_script

    metric = test_script.main(recipe, expdir)
    assert metric < 0.35, f"attention beam error rate {metric}"


def test_nbest_ranked(trained_las):
    _, recipe, expdir, _ = trained_las
    import numpy as np

    from nabu_tpu.config import Recipe
    from nabu_tpu.decoding.recognizers import build_recognizer
    from nabu_tpu.scripts.common import make_loader, model_from_recipe
    from nabu_tpu.scripts.test import load_best_params

    r = Recipe(recipe)
    rconf = r.recognizer.section("recognizer")
    rconf.set("nbest", "4")
    model, _ = model_from_recipe(
        r, expdir, rconf["features"], rconf["targets"]
    )
    loader, _, _ = make_loader(r, expdir, rconf, batch_size=8, num_buckets=1)
    params = load_best_params(expdir, model)
    rec = build_recognizer(rconf, model)
    batch = next(iter(loader.epoch(0, shuffle=False)))
    out = rec(params, batch.features, batch.feature_lengths)
    assert out.ids.shape[1] == 4
    # beams are ranked by length-normalized score (length_norm_power=1)
    for b in range(out.scores.shape[0]):
        if not batch.example_mask[b]:
            continue
        key = out.scores[b] / np.maximum(out.lengths[b], 1)
        assert all(
            key[i] >= key[i + 1] - 1e-4 for i in range(len(key) - 1)
        ), key
