"""CLI and script coverage: sweep over variants, multiprocess data
prep, argument handling."""

import os

import numpy as np
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
num_steps = 20
learning_rate = 1e-3
valid_frequency = 0
log_frequency = 10
"""


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = {
        "train": make_corpus(str(root / "train"), 16, seed=0),
        "dev": make_corpus(str(root / "dev"), 8, seed=1),
    }
    recipe = str(root / "recipe")
    write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
    return root, recipe


def test_sweep(tiny_setup):
    root, recipe = tiny_setup
    sweep_file = str(root / "sweep.cfg")
    with open(sweep_file, "w") as f:
        f.write(
            "model/encoder/num_units 8\n"
            "\n"
            "model/encoder/num_units 24\n"
            "trainer/trainer/num_steps 10\n"
        )
    expdir = str(root / "sweep_exp")
    from nabu_tpu.scripts import sweep

    sweep.main(recipe, expdir, sweep_file)
    for i in (0, 1):
        sub = os.path.join(expdir, f"sweep_{i}")
        assert os.path.exists(os.path.join(sub, "test_result.json"))
        # the patched recipe was materialized
        from nabu_tpu.config import Recipe

        r = Recipe(os.path.join(sub, "recipe"))
        units = r.model.section("encoder").getint("num_units")
        assert units == (8 if i == 0 else 24)


def test_data_prep_multiworker(tiny_setup):
    """num_workers > 1 produces identical shards content (same utts,
    same features) as serial prep."""
    root, recipe = tiny_setup
    from nabu_tpu.data.storage import ShardedDataset
    from nabu_tpu.scripts import data as data_script

    exp_serial = str(root / "prep_serial")
    exp_par = str(root / "prep_par")
    data_script.main(recipe, exp_serial)
    data_script.main(recipe, exp_par, num_workers=2)
    ds_s = ShardedDataset(os.path.join(exp_serial, "data", "trainfeatures"))
    ds_p = ShardedDataset(os.path.join(exp_par, "data", "trainfeatures"))
    assert ds_s.utt_ids == ds_p.utt_ids
    for utt in ds_s.utt_ids[:4]:
        np.testing.assert_allclose(ds_s[utt], ds_p[utt], atol=1e-6)
    assert (
        ds_p.metadata["num_utts"] == ds_s.metadata["num_utts"]
        and ds_p.metadata["dim"] == ds_s.metadata["dim"]
    )


def test_cli_parser():
    from nabu_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(
        ["train", "--recipe", "r", "--expdir", "e", "--num_model_parallel", "2"]
    )
    assert args.command == "train" and args.num_model_parallel == 2
    with pytest.raises(SystemExit):
        p.parse_args(["train"])  # missing required args


def test_train_computing_condor_dry_run(tmp_path):
    """`run train --computing=condor` writes one submit description per
    process (the reference's --computing=condor multi_machine mode)."""
    from nabu_tpu.cli import main

    conf = tmp_path / "condor.cfg"
    conf.write_text(
        "[computing]\nnum_processes = 3\ncoordinator_host = head\n"
        "dry_run = true\nrequest_cpus = 2\n"
    )
    expdir = str(tmp_path / "exp")
    rc = main([
        "train", "--recipe=/r", f"--expdir={expdir}",
        "--computing=condor", f"--computing_conf={conf}",
    ])
    assert rc == 0
    jobs = sorted(os.listdir(os.path.join(expdir, "condor")))
    assert jobs == ["proc_0.job", "proc_1.job", "proc_2.job"]
    text = open(os.path.join(expdir, "condor", "proc_2.job")).read()
    assert "--process_id=2" in text and "--coordinator=head:29500" in text


def test_train_computing_ssh_stub(tmp_path, monkeypatch):
    """`run train --computing=ssh` launches one remote process per host
    of the machine list (stub ssh records the invocations)."""
    import stat

    from nabu_tpu.cli import main

    bindir = tmp_path / "bin"
    bindir.mkdir()
    ssh = bindir / "ssh"
    ssh.write_text(f'#!/bin/sh\necho "$@" >> {tmp_path}/ssh_calls\n')
    ssh.chmod(ssh.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    machines = tmp_path / "machines.txt"
    machines.write_text("host-a\nhost-b\n")
    conf = tmp_path / "ssh.cfg"
    conf.write_text(f"[computing]\ncluster_file = {machines}\nport = 1234\n")
    expdir = str(tmp_path / "exp")
    rc = main([
        "train", "--recipe=/r", f"--expdir={expdir}",
        "--computing=ssh", f"--computing_conf={conf}",
    ])
    assert rc == 0
    calls = open(tmp_path / "ssh_calls").read().strip().splitlines()
    assert len(calls) == 2
    assert "host-a" in calls[0] and "--process_id=0" in calls[0]
    assert "host-b" in calls[1] and "--process_id=1" in calls[1]
    assert "--coordinator=host-a:1234" in calls[1]


def test_synth_corpus_demo(tmp_path):
    """`python -m nabu_tpu.tools.synth_corpus` writes a runnable corpus
    plus recipe: data prep and a short train run work out of the box."""
    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import train as train_script
    from nabu_tpu.tools import synth_corpus

    out = str(tmp_path / "demo")
    rc = synth_corpus.main([
        "--out", out, "--num_train", "8", "--num_dev", "4",
        "--num_test", "4", "--num_steps", "3",
    ])
    assert rc == 0
    recipe = os.path.join(out, "recipe")
    for cfg in ("database.conf", "model.cfg", "trainer.cfg",
                "validation_evaluator.cfg", "test_evaluator.cfg",
                "recognizer.cfg"):
        assert os.path.exists(os.path.join(recipe, cfg))
    expdir = str(tmp_path / "exp")
    data_script.main(recipe, expdir)
    from nabu_tpu.data.storage import ShardedDataset

    ds = ShardedDataset(os.path.join(expdir, "data", "trainfeatures"))
    assert ds.metadata["num_utts"] == 8 and ds.metadata["dim"] == 40
    train_script.main(recipe, expdir)
    assert os.path.exists(os.path.join(expdir, "checkpoints"))


def test_kill_computing_ssh_stub(tmp_path, monkeypatch):
    """`run kill --computing=ssh` kills by recorded pidfile, per host."""
    import stat

    from nabu_tpu.cli import main

    bindir = tmp_path / "bin"
    bindir.mkdir()
    ssh = bindir / "ssh"
    ssh.write_text(f'#!/bin/sh\necho "$@" >> {tmp_path}/ssh_calls\n')
    ssh.chmod(ssh.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    machines = tmp_path / "machines.txt"
    machines.write_text("host-a\nhost-b\n")
    conf = tmp_path / "ssh.cfg"
    conf.write_text(f"[computing]\ncluster_file = {machines}\n")
    rc = main([  # --expdir not needed for the ssh (pidfile) path
        "kill", "--computing=ssh", f"--computing_conf={conf}",
    ])
    assert rc == 0
    calls = open(tmp_path / "ssh_calls").read()
    assert calls.count("kill $(cat") == 2
