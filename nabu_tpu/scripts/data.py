"""`run data`: prepare every dataset section of database.conf.

Capability parity with nabu/scripts/data.py (SURVEY.md §3.1): for each
section, build its processor, process every datafile line, and write
shards + metadata. The per-utterance hot loop is embarrassingly
parallel; a process pool splits it across CPUs.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Tuple

import numpy as np

from nabu_tpu.config import Recipe
from nabu_tpu.data.processors import make_processor, read_datafile
from nabu_tpu.data.storage import ShardWriter
from nabu_tpu.scripts.common import data_dir

_WORKER_PROC = None


def _init_worker(conf_values):
    global _WORKER_PROC
    from nabu_tpu.config import Conf

    _WORKER_PROC = make_processor(Conf(conf_values))


def _process_one(entry: Tuple[str, str, float]):
    utt, value, speed = entry
    return utt, _WORKER_PROC.process(value, speed=speed)


def _expand_speed(entries, section):
    """3-way speed perturbation (``speed_perturb = 0.9 1.0 1.1``):
    replicate every entry per factor, suffixing ids with ``#sp<f>``
    (factor 1.0 keeps the plain id). Feature AND target sections of a
    split must carry the same factors so ids stay paired."""
    factors = [
        float(f) for f in section.getlist("speed_perturb", ["1.0"])
    ]
    out = []
    for utt, value in entries:
        for f in factors:
            uid = utt if f == 1.0 else f"{utt}#sp{f:g}"
            out.append((uid, value, f))
    return out


def prepare_section(
    recipe: Recipe, expdir: str, name: str, num_workers: int = 0
) -> dict:
    section = recipe.database.section(name)
    out_dir = data_dir(expdir, section, name)
    entries = _expand_speed(read_datafile(section["datafile"]), section)
    processor = make_processor(section)
    writer = ShardWriter(out_dir)
    if num_workers > 1:
        with ProcessPoolExecutor(
            max_workers=num_workers,
            initializer=_init_worker,
            initargs=(section.as_dict(),),
        ) as pool:
            for utt, arr in pool.map(_process_one, entries, chunksize=16):
                writer.write(utt, np.asarray(arr))
        # metadata from writer stats; processor-side metadata (alphabet
        # etc.) comes from a fresh processor instance's static config
        meta = writer.close(processor.metadata())
    else:
        for utt, value, speed in entries:
            writer.write(
                utt, np.asarray(processor.process(value, speed=speed))
            )
        meta = writer.close(processor.metadata())
    return meta


def main(recipe_path: str, expdir: str, num_workers: int = 0) -> None:
    recipe = Recipe(recipe_path)
    os.makedirs(expdir, exist_ok=True)
    for name in recipe.database.sections():
        meta = prepare_section(recipe, expdir, name, num_workers)
        print(
            f"[data] {name}: {meta['num_utts']} utts, dim={meta.get('dim')}, "
            f"max_length={meta['max_length']}"
        )
