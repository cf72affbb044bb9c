"""`run lm`: train an n-gram LM from a recipe's training transcriptions.

Beyond-parity command (the reference dumps n-best "for downstream
rescoring" but ships no LM). The LM is trained over the SAME alphabet
ids as the acoustic model (the recipe's targets TextProcessor), so the
saved .npz plugs straight into beam-search shallow fusion
(``recognizer.cfg: lm_path/lm_weight``) and ``run rescore``.
"""

from __future__ import annotations

import math
import os

from nabu_tpu.config import Recipe
from nabu_tpu.data.processors import TextProcessor, read_datafile
from nabu_tpu.decoding.lm import NgramLM


def main(
    recipe_path: str,
    expdir: str,
    order: int = 3,
    targets: str = "traintargets",
) -> str:
    recipe = Recipe(recipe_path)
    conf = recipe.database.section(targets)
    proc = TextProcessor(conf)
    entries = read_datafile(conf.get("datafile"))
    sequences = [list(proc.process(value)) for _, value in entries]
    vocab = proc.num_labels + 1  # boundary symbol shares the eos id

    lm = NgramLM.train(sequences, vocab, order)
    path = os.path.join(expdir, "lm", f"lm_{order}gram.npz")
    lm.save(path)

    # training-set perplexity as a sanity number (includes </s> events)
    total_lp, total_events = 0.0, 0
    for seq in sequences:
        total_lp += lm.logprob(seq)
        total_events += len(seq) + 1
    ppl = math.exp(-total_lp / max(total_events, 1))
    print(
        f"[lm] {order}-gram over {vocab} ids from {len(sequences)} "
        f"utterances -> {path} (train ppl {ppl:.2f})"
    )
    return path
