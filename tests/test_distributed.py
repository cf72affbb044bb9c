"""Multi-process distributed training test (SURVEY.md §4:
jax.distributed multi-process tests via spawned local processes).

Two local CPU processes form a jax.distributed group and run the real
`run train --distributed` code path over a shared expdir: the loader
gives each host a disjoint shard, GSPMD reduces gradients globally, and
only the chief writes metrics/checkpoints.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

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
batch_size = 4
num_buckets = 1
num_steps = 12
learning_rate = 2e-3
valid_frequency = 6
log_frequency = 4
num_tries = 10
"""

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from nabu_tpu.scripts import train
    result = train.main(
        {recipe!r}, {expdir!r},
        distributed=True,
        coordinator={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    print("WORKER_DONE", sys.argv[1], result["step"], result["best_metric"])
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(420)
def test_two_process_training(tmp_path):
    corpus = {
        "train": make_corpus(str(tmp_path / "train"), 16, seed=0),
        "dev": make_corpus(str(tmp_path / "dev"), 8, seed=1),
    }
    recipe = str(tmp_path / "recipe")
    write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
    expdir = str(tmp_path / "exp")

    # data prep once (in-process)
    from nabu_tpu.scripts import data as data_script

    data_script.main(recipe, expdir)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    prog = WORKER.format(
        repo=repo, recipe=recipe, expdir=expdir, coord=coord
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children use 1 CPU device each
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for r, out in enumerate(outs):
        assert f"WORKER_DONE {r} 12" in out, out[-2000:]

    # chief-only outputs exist
    assert os.path.isdir(os.path.join(expdir, "checkpoints", "latest"))
    metrics = [
        json.loads(l)
        for l in open(os.path.join(expdir, "logs", "metrics.jsonl"))
    ]
    train_lines = [m for m in metrics if "train/loss" in m]
    assert len(train_lines) >= 2
    # both hosts reported the same global loss (chief logged it once)
    valid_lines = [m for m in metrics if "valid/metric" in m]
    assert len(valid_lines) >= 1
