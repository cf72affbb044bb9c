"""End-to-end integration test of BASELINE config 1 (CTC BLSTM,
CPU-runnable): synthetic corpus -> run data -> run train (loss
decreases) -> run test (error rate) -> run decode (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from tests.corpus_utils import make_corpus, write_recipe

MODEL_CFG = """[encoder]
encoder = dblstm
num_layers = 2
num_units = 32

[decoder]
decoder = linear_ctc
loss = ctc
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 2
num_steps = 400
learning_rate = 5e-3
learning_rate_decay = 1.0
clip_grad_norm = 5.0
valid_frequency = 100
log_frequency = 10
num_tries = 8
early_stopping = true
"""


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    corpus = {}
    corpus["train"] = make_corpus(str(root / "train"), 64, seed=0)
    corpus["dev"] = make_corpus(str(root / "dev"), 12, seed=1)
    recipe = str(root / "recipe")
    write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
    expdir = str(root / "exp")

    from nabu_tpu.scripts import data as data_script
    data_script.main(recipe, expdir)

    from nabu_tpu.scripts import train as train_script
    result = train_script.main(recipe, expdir)
    return root, recipe, expdir, result


def test_data_prep(trained_exp):
    root, recipe, expdir, _ = trained_exp
    meta = json.load(
        open(os.path.join(expdir, "data", "trainfeatures", "metadata.json"))
    )
    assert meta["num_utts"] == 64
    assert meta["dim"] == 10
    tmeta = json.load(
        open(os.path.join(expdir, "data", "traintargets", "metadata.json"))
    )
    assert tmeta["num_labels"] == 3


def test_loss_decreases(trained_exp):
    _, _, expdir, result = trained_exp
    lines = [
        json.loads(l)
        for l in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    train_losses = [l["train/loss"] for l in lines if "train/loss" in l]
    assert len(train_losses) >= 5
    assert train_losses[-1] < train_losses[0] * 0.7, train_losses
    assert result["step"] == 400 or result["stopped_early"]


def test_checkpoints_exist(trained_exp):
    _, _, expdir, _ = trained_exp
    assert os.path.isdir(os.path.join(expdir, "checkpoints", "latest"))
    assert os.path.isdir(os.path.join(expdir, "checkpoints", "best"))


def test_test_and_decode(trained_exp):
    _, recipe, expdir, _ = trained_exp
    from nabu_tpu.scripts import decode as decode_script
    from nabu_tpu.scripts import test as test_script

    metric = test_script.main(recipe, expdir)
    # the tone task is easy; a trained model must beat the trivial
    # all-deletions rate of 1.0 by a wide margin
    assert metric < 0.1, f"error rate {metric}"
    assert os.path.exists(os.path.join(expdir, "test_result.json"))

    out_path = decode_script.main(recipe, expdir)
    lines = open(out_path).read().strip().splitlines()
    assert len(lines) == 12
    utts = {l.split()[0] for l in lines}
    assert len(utts) == 12
    # hypotheses are in the corpus alphabet
    for l in lines:
        parts = l.split()
        assert all(tok in ("a", "b", "c") for tok in parts[2:])


def test_resume(trained_exp):
    """resume=true continues from the latest checkpoint."""
    root, recipe, expdir, _ = trained_exp
    import shutil

    from nabu_tpu.config import Recipe
    from nabu_tpu.scripts import train as train_script

    recipe2 = str(root / "recipe_resume")
    shutil.copytree(recipe, recipe2)
    r = Recipe(recipe2)
    r.trainer.section("trainer").set("resume", "true")
    r.trainer.section("trainer").set("num_steps", "410")
    r.trainer.write(os.path.join(recipe2, "trainer.cfg"))
    result = train_script.main(recipe2, expdir)
    assert result["step"] == 410


def test_bf16_training_converges(tmp_path):
    """bfloat16 compute (the TPU recipes' default) trains stably: same
    config-1 pipeline with compute_dtype=bfloat16, loss must drop."""
    corpus = {
        "train": make_corpus(str(tmp_path / "train"), 32, seed=0),
        "dev": make_corpus(str(tmp_path / "dev"), 8, seed=1),
    }
    recipe = str(tmp_path / "recipe")
    model_cfg = MODEL_CFG.replace(
        "[encoder]", "[model]\ncompute_dtype = bfloat16\n\n[encoder]"
    )
    trainer_cfg = TRAINER_CFG.replace(
        "num_steps = 400", "num_steps = 60"
    ).replace("valid_frequency = 100", "valid_frequency = 0")
    write_recipe(recipe, corpus, model_cfg, trainer_cfg)
    expdir = str(tmp_path / "exp")

    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import train as train_script

    data_script.main(recipe, expdir)
    train_script.main(recipe, expdir)
    lines = [
        json.loads(line)
        for line in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    losses = [m["train/loss"] for m in lines if "train/loss" in m]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8
