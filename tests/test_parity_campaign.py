"""Unit tests for the parity-campaign runner's pure helpers (the
subprocess-driving stages are exercised by the campaign itself —
tools/parity_campaign.py; results land in PARITY_RESULTS.md)."""

import json
import os

from nabu_tpu.config import Recipe
from nabu_tpu.tools.parity_campaign import (
    _train_metrics,
    build_campaign_recipe,
    write_results,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_metrics_median_and_span(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    rows = [
        {"step": 10, "time": 100.0, "train/audio_s_per_s": 50.0},
        {"step": 20, "time": 110.0, "train/audio_s_per_s": 100.0},
        {"step": 30, "time": 120.0, "train/audio_s_per_s": 200.0},
        {"step": 40, "time": 130.0, "train/audio_s_per_s": 300.0},
        {"step": 40, "time": 131.0, "valid/metric": 0.5},
    ]
    with open(logs / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    rate, step, span = _train_metrics(str(tmp_path))
    # median of the second half of rate windows = median(200, 300)
    assert rate in (200.0, 300.0)
    assert step == 40
    assert span == 31.0


def test_build_campaign_recipe_carries_model_and_features(tmp_path):
    corpus = tmp_path / "corpus"
    splits = {}
    for split in ("train", "dev", "test"):
        d = corpus / split
        d.mkdir(parents=True)
        (d / "wav.scp").write_text("u1 /x.wav\n")
        (d / "text").write_text("u1 a b\n")
        splits[split] = (str(d / "wav.scp"), str(d / "text"))
    out = build_campaign_recipe(
        os.path.join(REPO, "config", "recipes", "ctc_blstm_timit"),
        str(tmp_path / "recipe"),
        splits,
        ["a", "b", "c"],
        {"num_epochs": 3, "valid_frequency": 0},
        batch_size=4,
    )
    recipe = Recipe(out)
    # model architecture is the committed one, verbatim
    src_model = open(os.path.join(
        REPO, "config", "recipes", "ctc_blstm_timit", "model.cfg"
    )).read()
    assert open(os.path.join(out, "model.cfg")).read() == src_model
    # database points at the proxy corpus with the committed recipe's
    # feature-processing keys and the proxy alphabet
    fsec = recipe.database.section("trainfeatures")
    assert fsec["datafile"] == splits["train"][0]
    assert fsec.get("feature")  # carried over (e.g. fbank)
    tsec = recipe.database.section("traintargets")
    assert tsec["alphabet"].split() == ["a", "b", "c"]
    # trainer overrides applied on top of the committed trainer config
    tconf = recipe.trainer.section("trainer")
    assert tconf.getint("num_epochs") == 3
    assert tconf.getint("batch_size") == 4
    # evaluator/recognizer files exist and parse
    assert recipe.test_evaluator.section("evaluator").get("evaluator")
    assert recipe.recognizer.section("recognizer").get("recognizer")


def test_write_results_renders_all_rows(tmp_path):
    rows = [
        {"config": "c1", "platform": "tpu", "test_error": 0.0372,
         "train_audio_s_per_s": 3425.4, "steps": 2150,
         "train_wall_s": 148.9, "decode_rtf": 0.001},
        {"config": "c1", "platform": "cpu", "test_error": None,
         "train_audio_s_per_s": 78.1, "steps": 86,
         "train_wall_s": 226.8, "decode_rtf": 0.0101},
    ]
    path = tmp_path / "PARITY_RESULTS.md"
    write_results(str(path), rows, "test corpus desc")
    text = path.read_text()
    assert "0.0372" in text and "3425.4" in text
    assert "| cpu |" in text and "| - |" in text  # None -> dash
    assert "test corpus desc" in text
