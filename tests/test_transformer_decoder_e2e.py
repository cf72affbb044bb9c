"""End-to-end test of the beyond-parity transformer attention decoder:
a joint CTC/attention model with a TRANSFORMER decoder head (instead of
the LSTM speller) trains on the tone corpus and its beam decode scores.
"""

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
decoder = transformer
num_layers = 2
num_units = 32
num_heads = 2
ffn_dim = 64
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
learning_rate = 2e-3
valid_frequency = 125
log_frequency = 50
num_tries = 8
"""

RECOGNIZER = """recognizer = attention_beam
head = att
beam_width = 4
length_norm_power = 1.0"""


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("tfdec_e2e")
    corpus = {
        "train": make_corpus(str(root / "train"), 72, seed=30, min_len=3,
                             max_len=6),
        "dev": make_corpus(str(root / "dev"), 12, seed=31, min_len=3,
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


def test_attention_loss_decreases(trained):
    _, _, expdir, _ = trained
    lines = [
        json.loads(l)
        for l in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    att = [l["train/loss/att"] for l in lines if "train/loss/att" in l]
    assert att[-1] < att[0] * 0.5, att


def test_transformer_decoder_beam_decodes(trained):
    _, recipe, expdir, _ = trained
    from nabu_tpu.scripts import test as test_script

    metric = test_script.main(recipe, expdir)
    assert metric < 0.35, f"transformer-decoder error rate {metric}"
