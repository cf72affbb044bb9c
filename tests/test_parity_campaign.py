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


def test_write_results_marks_wallclock_rtf_rows(tmp_path):
    """RTF provenance per row (round-2 verdict Next #8): a wall-clock
    fallback value (compile INCLUDED) is visibly marked and footnoted,
    never silently mixed with steady-state rows."""
    rows = [
        {"config": "c1", "platform": "tpu", "test_error": 0.1,
         "train_audio_s_per_s": 100.0, "steps": 10,
         "train_wall_s": 5.0, "decode_rtf": 0.002,
         "rtf_kind": "steady"},
        {"config": "c2", "platform": "tpu", "test_error": 0.2,
         "train_audio_s_per_s": 100.0, "steps": 10,
         "train_wall_s": 5.0, "decode_rtf": 0.9,
         "rtf_kind": "wall"},
    ]
    path = tmp_path / "r.md"
    write_results(str(path), rows, "desc")
    text = path.read_text()
    assert "0.9 †" in text
    assert "0.002 |" in text and "0.002 †" not in text
    assert "wall-clock fallback" in text

    # no footnote when every row is steady-state
    write_results(str(path), rows[:1], "desc")
    assert "wall-clock fallback" not in path.read_text()


def test_backfill_row_from_expdir(tmp_path):
    """backfill_row recovers a row from a completed expdir's
    test_result.json + metrics.jsonl without re-running anything."""
    from nabu_tpu.tools.parity_campaign import backfill_row

    expdir = tmp_path / "exp_ctc_blstm_timit"
    (expdir / "logs").mkdir(parents=True)
    with open(expdir / "test_result.json", "w") as f:
        json.dump({"metric": 0.0372, "evaluator": "decoder"}, f)
    with open(expdir / "logs" / "metrics.jsonl", "w") as f:
        for step, t, r in ((10, 0.0, 900.0), (20, 10.0, 1000.0),
                           (30, 20.0, 1100.0)):
            f.write(json.dumps({
                "step": step, "time": t, "train/audio_s_per_s": r,
            }) + "\n")
    row = backfill_row("ctc_blstm_timit", str(tmp_path))
    assert row["test_error"] == 0.0372
    assert row["steps"] == 30
    assert row["rtf_kind"] == "backfill"
    assert row["decode_rtf"] is None
    # no expdir -> no row (not an error)
    assert backfill_row("las_timit", str(tmp_path)) is None


def test_phone40_v2_split_generates_audio(tmp_path):
    """The recalibrated v2 profile (babble + channel + independent
    F1/F2 warps) produces valid utterances end-to-end."""
    import numpy as np

    from nabu_tpu.data import audio_io
    from nabu_tpu.tools.synth_corpus import (
        _phone40_bigram,
        _phone40_inventory,
        make_phone40_split,
    )

    rng = np.random.default_rng(0)
    phones = _phone40_inventory()
    bigram = _phone40_bigram(rng)
    speakers = [("spkA", 1.05, 0.92), ("spkB", 0.9, 1.1)]
    scp, text = make_phone40_split(
        str(tmp_path), 8.0, 1, speakers, phones, bigram,
        min_s=3.0, max_s=4.0, version=2,
    )
    scps = open(scp).read().strip().splitlines()
    texts = open(text).read().strip().splitlines()
    assert len(scps) == len(texts) >= 2
    utt, path = scps[0].split()
    sig, rate = audio_io.load_audio(path)
    assert rate == 16000
    # crossfades remove ~30 ms per phone boundary, so a 3 s symbol
    # budget lands well under 3 s of audio — but never trivially short
    assert len(sig) >= 1.5 * rate
    peak = np.abs(np.asarray(sig, np.float64)).max()
    assert 100.0 < peak <= 30000.5  # audible, never int16-clipped
    # transcripts use the 40-phone alphabet
    names = {p["name"] for p in phones}
    assert set(texts[0].split()[1:]) <= names


def test_write_results_corpus_hours_column(tmp_path):
    """Rows carry corpus_h and the table renders a Train h column so
    2 h calibration rows and 20 h attention-scale rows coexist
    (round-3 verdict Next #1)."""
    rows = [
        {"config": "las_timit", "platform": "tpu", "corpus_h": 2.0,
         "test_error": 0.92, "train_audio_s_per_s": 1450.0,
         "steps": 7560, "train_wall_s": 1360.0, "decode_rtf": 0.001},
        {"config": "las_timit", "platform": "tpu", "corpus_h": 20.0,
         "test_error": 0.25, "train_audio_s_per_s": 2000.0,
         "steps": 24000, "train_wall_s": 2500.0, "decode_rtf": 0.001},
    ]
    path = tmp_path / "r.md"
    write_results(str(path), rows, "desc")
    text = path.read_text()
    assert "| Corpus |" in text
    assert "| las_timit | tpu | v2 2h | 0.9200 |" in text
    assert "| las_timit | tpu | v2 20h | 0.2500 |" in text


def test_row_filename_tags_corpus_scale():
    """A 20 h row must not overwrite the 2 h row for the same
    config x platform: the filename carries the corpus tag."""
    from nabu_tpu.tools.parity_campaign import row_filename

    base = {"config": "las_timit", "platform": "tpu"}
    assert row_filename({**base, "corpus_h": 2.0}) == "las_timit_tpu.json"
    assert row_filename(base) == "las_timit_tpu.json"  # legacy rows
    assert row_filename(
        {**base, "corpus_h": 20.0}
    ) == "las_timit_tpu_20h.json"
    assert row_filename(
        {**base, "platform": "cpu", "corpus_h": 0.5}
    ) == "las_timit_cpu_0.5h.json"
    assert row_filename(
        {**base, "corpus_h": 20.0, "corpus_version": 3}
    ) == "las_timit_tpu_20h_v3.json"
