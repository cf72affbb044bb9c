"""Export + serving: `run export` artifact portability, exported
recognizer equals the in-experiment recognize path, and the `run serve`
line protocol."""

import io
import json
import os
import shutil

import pytest

from tests.corpus_utils import make_corpus, write_recipe

MODEL_CFG = """[encoder]
encoder = dnn
num_layers = 1
num_units = 16

[decoder]
decoder = linear_ctc
loss = ctc
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 1
num_steps = 25
learning_rate = 1e-3
valid_frequency = 0
log_frequency = 10
"""


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    corpus = {
        "train": make_corpus(str(root / "train"), 12, seed=30),
        "dev": make_corpus(str(root / "dev"), 4, seed=31),
    }
    recipe = str(root / "recipe")
    write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
    expdir = str(root / "exp")
    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import train as train_script

    data_script.main(recipe, expdir)
    train_script.main(recipe, expdir)
    return root, recipe, expdir, corpus


def _dev_wavs(corpus, n=3):
    scp, _ = corpus["dev"]
    entries = [
        line.split(None, 1) for line in open(scp).read().splitlines()
    ]
    return entries[:n]


class TestExport:
    def test_artifact_is_portable_and_matches_recognize(self, trained):
        root, recipe, expdir, corpus = trained
        from nabu_tpu.scripts import recognize
        from nabu_tpu.serving import export_model, load_exported

        out = export_model(recipe, expdir)
        for fname in (
            "manifest.json", "params.npz", "model.cfg",
            "frontend.cfg", "recognizer.cfg",
        ):
            assert os.path.exists(os.path.join(out, fname)), fname
        manifest = json.load(open(os.path.join(out, "manifest.json")))
        assert manifest["input_dim"] == 10  # nfilt
        assert manifest["num_labels"] == 3  # alphabet a b c

        # nothing in the configs may point back into the expdir: the
        # artifact must survive being moved to another machine
        for fname in ("frontend.cfg", "recognizer.cfg"):
            text = open(os.path.join(out, fname)).read()
            assert expdir not in text, (fname, text)
            assert "datafile" not in text

        moved = str(root / "moved_artifact")
        shutil.move(out, moved)

        entries = _dev_wavs(corpus)
        exported = load_exported(moved)
        got = exported.recognize_files([p for _, p in entries])
        want = recognize.main(
            recipe, expdir, [p for _, p in entries]
        )
        assert got == [text for _, text in want]

    def test_recognize_single(self, trained):
        root, recipe, expdir, corpus = trained
        from nabu_tpu.serving import export_model, load_exported

        out = export_model(recipe, expdir, str(root / "art2"))
        exported = load_exported(out)
        (utt, path), = _dev_wavs(corpus, 1)
        text = exported.recognize(path)
        assert isinstance(text, str)
        assert set(text.split()) <= {"a", "b", "c"}


STREAM_MODEL_CFG = """[encoder]
encoder = dblstm
bidirectional = false
num_layers = 1
num_units = 12

[decoder]
decoder = rnnt
num_units = 10
embed_dim = 6
joint_units = 8
loss = transducer
"""

STREAM_TRAINER_CFG = TRAINER_CFG.replace("num_steps = 25", "num_steps = 8")


class TestStreamingServe:
    @pytest.fixture(scope="class")
    def stream_export(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("serving_stream")
        corpus = {
            "train": make_corpus(str(root / "train"), 8, seed=32),
            "dev": make_corpus(str(root / "dev"), 3, seed=33),
        }
        recipe = str(root / "recipe")
        write_recipe(
            recipe, corpus, STREAM_MODEL_CFG, STREAM_TRAINER_CFG,
            recognizer_lines=(
                "recognizer = transducer_streaming\nchunk_frames = 16"
            ),
        )
        expdir = str(root / "exp")
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts import train as train_script
        from nabu_tpu.serving import export_model

        data_script.main(recipe, expdir)
        train_script.main(recipe, expdir)
        out = export_model(recipe, expdir)
        return out, corpus

    def test_stream_file_matches_offline(self, stream_export):
        out, corpus = stream_export
        from nabu_tpu.serving import load_exported

        exported = load_exported(out)
        entries = _dev_wavs(corpus, 2)
        partials = []
        final = exported.stream_file(
            entries[0][1], on_partial=partials.append
        )
        # offline decode through the exported recognizer == streamed
        offline = exported.recognize(entries[0][1])
        assert final == offline
        # every partial is a prefix of the final hypothesis
        for p in partials:
            assert final.startswith(p)

    def test_serve_streaming_protocol(self, stream_export):
        out, corpus = stream_export
        from nabu_tpu.serving import load_exported, serve

        entries = _dev_wavs(corpus, 2)
        lines = "".join(f"{u} {p}\n" for u, p in entries)
        out_stream = io.StringIO()
        served = serve(
            out, in_stream=io.StringIO(lines), out_stream=out_stream,
            streaming=True,
        )
        assert served == len(entries)
        got = out_stream.getvalue().splitlines()
        finals = {
            line.split(" ", 2)[0]: (line.split(" ", 2) + [""])[2]
            for line in got
            if line.split(" ", 2)[1] == "FINAL"
        }
        assert set(finals) == {u for u, _ in entries}
        exported = load_exported(out)
        for utt, path in entries:
            assert finals[utt] == exported.recognize(path)
        # PARTIAL lines (if any) precede their FINAL and are prefixes
        for line in got:
            utt, kind, text = (line.split(" ", 2) + [""])[:3]
            if kind == "PARTIAL":
                assert finals[utt].startswith(text)


class TestServe:
    def test_line_protocol(self, trained):
        root, recipe, expdir, corpus = trained
        from nabu_tpu.serving import export_model, load_exported, serve

        out = export_model(recipe, expdir, str(root / "art3"))
        entries = _dev_wavs(corpus)
        lines = "".join(f"{u} {p}\n" for u, p in entries)
        lines += "\n"  # explicit flush barrier
        lines += "badline\n"  # missing path -> error line
        out_stream = io.StringIO()
        served = serve(
            out, in_stream=io.StringIO(lines), out_stream=out_stream,
            batch_size=2,
        )
        assert served == len(entries)
        got = out_stream.getvalue().splitlines()
        assert len(got) == len(entries) + 1
        assert got[-1].startswith("badline **ERROR**")

        exported = load_exported(out)
        want = exported.recognize_files([p for _, p in entries])
        for (utt, _), text, line in zip(entries, want, got):
            assert line == f"{utt} {text}".rstrip()


class TestDeviceFrontendServing:
    def test_device_frontend_matches_host_path(self, trained):
        """`run recognize` with the in-graph frontend (the default)
        produces the same hypotheses as the host-DSP fallback — the
        device==host proof through the FULL recognize path."""
        root, recipe, expdir, corpus = trained
        import nabu_tpu.features.jax_frontend as jf
        from nabu_tpu.scripts import recognize

        entries = _dev_wavs(corpus)
        paths = [p for _, p in entries]
        dev = recognize.main(recipe, expdir, paths)

        orig = jf.DeviceFrontend.make.__func__
        jf.DeviceFrontend.make = classmethod(lambda cls, sec: None)
        try:
            host = recognize.main(recipe, expdir, paths)
        finally:
            jf.DeviceFrontend.make = classmethod(orig)
        assert dev == host

    def test_serve_uses_device_frontend(self, trained):
        """The serve worker answers identically with the device
        frontend active, and the ExportedModel actually built one."""
        root, recipe, expdir, corpus = trained
        from nabu_tpu.serving import export_model, load_exported

        out = export_model(recipe, expdir, str(root / "art_devfe"))
        exported = load_exported(out)
        assert exported.device_fe is not None
        entries = _dev_wavs(corpus)
        got = exported.recognize_files([p for _, p in entries])
        # host fallback object for reference
        exported.device_fe = None
        want = exported.recognize_files([p for _, p in entries])
        assert got == want
