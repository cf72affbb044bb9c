"""N-gram language model: Witten-Bell interpolation, dense-table
shallow fusion, n-best rescoring.

Beyond-parity subsystem. The reference's decode stage dumps n-best
hypotheses "for downstream rescoring" but ships no LM; this module
closes that loop inside the framework:

- ``NgramLM.train`` builds a Witten-Bell interpolated n-gram model from
  integer label sequences (``run lm`` trains one from a recipe's
  training transcriptions with the same alphabet ids as the AM).
- ``DenseLM`` is the TPU-side view: the full conditional table
  ``logprobs [V^(order-1), V]`` lives as one device array, the LM state
  per hypothesis is a single int32 context index, and a step is one
  gather + one fused integer update — so shallow fusion adds O(1)
  device ops per beam expansion (no host callbacks, no tries/hashes).
  Char/phone alphabets keep the table tiny (V=31, order 3 -> 961x31).
- ``rescore_nbest`` re-ranks a decoded n-best list host-side with
  ``am_score + lm_weight * lm_score + length_bonus * len``.

Conventions: LM vocab = num_labels + 1; the last id doubles as the
sentence boundary (<s> as context, </s> as an event) — the same id the
attention Speller uses for <sos>/<eos>, so fusion needs no id remap
anywhere. CTC/transducer fusion simply never queries the boundary
column for emissions.

Witten-Bell (interpolated): p_k(w|h) = (c(h,w) + T(h) p_{k-1}(w|h')) /
(N(h) + T(h)) with T(h) = distinct continuations of h, h' = h minus its
oldest token; the unigram base interpolates with the uniform 1/V.
Every row therefore sums to one and no token has zero probability
(tested in tests/test_lm.py).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import List, Sequence, Tuple

import numpy as np


class NgramLM:
    """Host-side n-gram LM: dense conditional table + train/save/load."""

    def __init__(self, table: np.ndarray, order: int, vocab: int):
        assert table.shape == (vocab ** (order - 1), vocab)
        self.table = table.astype(np.float32)  # logprobs [S, V]
        self.order = int(order)
        self.vocab = int(vocab)
        self.boundary = vocab - 1

    # -- training ----------------------------------------------------------
    @classmethod
    def train(
        cls, sequences: Sequence[Sequence[int]], vocab: int, order: int = 3
    ) -> "NgramLM":
        """``sequences`` hold label ids in [0, vocab-1); id vocab-1 is
        reserved for the sentence boundary."""
        if order < 1:
            raise ValueError("order must be >= 1")
        if not sequences:
            raise ValueError(
                "cannot train an LM on an empty corpus (no sequences)"
            )
        V = vocab
        b = V - 1

        # unigram level: Witten-Bell against the uniform distribution
        c1 = np.zeros(V, np.float64)
        for seq in sequences:
            for t in seq:
                if not 0 <= int(t) < V - 1:
                    raise ValueError(f"label id {t} out of range")
                c1[int(t)] += 1
            c1[b] += 1  # </s> event per sentence
        N1, T1 = c1.sum(), float((c1 > 0).sum())
        prev = (c1 + T1 / V) / (N1 + T1)  # [V], sums to 1

        for k in range(2, order + 1):
            S = V ** (k - 1)
            # context index: oldest token is the most-significant digit,
            # so dropping it (backoff) = idx mod V^(k-2)
            table = np.tile(prev.reshape(-1, V), (V, 1))
            counts: dict = defaultdict(lambda: np.zeros(V, np.float64))
            for seq in sequences:
                stream = [b] * (k - 1) + [int(t) for t in seq] + [b]
                idx = 0
                for j in range(k - 1):
                    idx = idx * V + stream[j]
                for j in range(k - 1, len(stream)):
                    tok = stream[j]
                    counts[idx][tok] += 1
                    idx = (idx % (S // V)) * V + tok if S > V else tok
            for idx, cvec in counts.items():
                N, T = cvec.sum(), float((cvec > 0).sum())
                backoff = table[idx]  # pre-filled with p_{k-1}(·|h')
                table[idx] = (cvec + T * backoff) / (N + T)
            prev = table

        return cls(np.log(prev.reshape(V ** (order - 1), V)), order, V)

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, table=self.table, order=self.order, vocab=self.vocab)

    @classmethod
    def load(cls, path: str) -> "NgramLM":
        with np.load(path) as z:
            return cls(z["table"], int(z["order"]), int(z["vocab"]))

    # -- host-side scoring (rescoring) ---------------------------------------
    def logprob(self, seq: Sequence[int], include_eos: bool = True) -> float:
        V, S = self.vocab, self.vocab ** (self.order - 1)
        idx = self._boundary_state()
        total = 0.0
        events = list(int(t) for t in seq)
        if include_eos:
            events.append(self.boundary)
        for tok in events:
            total += float(self.table[idx, tok])
            idx = (idx % max(S // V, 1)) * V + tok if S > 1 else 0
        return total

    def _boundary_state(self) -> int:
        idx = 0
        for _ in range(self.order - 1):
            idx = idx * self.vocab + self.boundary
        return idx

    def dense(self) -> "DenseLM":
        import jax.numpy as jnp

        return DenseLM(
            jnp.asarray(self.table), self.order, self.vocab,
            self._boundary_state(),
        )


class DenseLM:
    """Device-side LM view used inside jitted beam searches: the state
    per hypothesis is one int32 context index."""

    def __init__(self, table, order: int, vocab: int, boundary_state: int):
        self.table = table  # [S, V] logprobs
        self.order = order
        self.vocab = vocab
        self.boundary_state = boundary_state
        self.num_states = table.shape[0]

    def init_state(self, shape: Tuple[int, ...]):
        import jax.numpy as jnp

        return jnp.full(shape, self.boundary_state, jnp.int32)

    def step(self, state, token):
        """Shift ``token`` into the context window (vectorized)."""
        if self.order == 1:
            return state
        keep = self.num_states // self.vocab  # V^(order-2)
        return (state % keep) * self.vocab + token

    def logprobs(self, state):
        """Gather conditional logprob rows: state [...] -> [..., V]."""
        return self.table[state]


def state_where(cond, a, b):
    """Per-leaf ``where`` over an LM state pytree: select ``a`` where
    ``cond`` (shaped like the beam, e.g. [B, W]) else ``b``; the
    condition broadcasts over each leaf's trailing state dims. The one
    primitive that lets scalar n-gram contexts and pytree neural-LM
    states ride the same beam-search code."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x, y: jnp.where(
            cond.reshape(cond.shape + (1,) * (x.ndim - cond.ndim)), x, y
        ),
        a,
        b,
    )


def load_lm(path: str):
    """Host-side LM handle by file contents: NgramLM or neural RnnLM
    (both expose ``logprob``/``dense``)."""
    with np.load(path) as z:
        kind = str(z["kind"]) if "kind" in z.files else "ngram"
    if kind == "rnn":
        from nabu_tpu.decoding.neural_lm import RnnLM

        return RnnLM.load(path)
    return NgramLM.load(path)


def load_dense_lm(path: str):
    return load_lm(path).dense()


def rescore_nbest(
    entries: List[Tuple[str, float, List[int]]],
    lm: NgramLM,
    lm_weight: float,
    length_bonus: float = 0.0,
) -> List[Tuple[str, float, List[int]]]:
    """Re-rank (utt, am_score, ids) entries by
    ``am + lm_weight * lm + length_bonus * len``; stable within utt.
    ``lm`` is an NgramLM or neural RnnLM; batched scoring is used when
    the LM provides it (one device call for the whole n-best list)."""
    if hasattr(lm, "seq_logprobs") and entries:
        lm_scores = lm.seq_logprobs([ids for _, _, ids in entries])
    else:
        lm_scores = [lm.logprob(ids) for _, _, ids in entries]
    rescored = [
        (
            utt,
            am + lm_weight * float(lp) + length_bonus * len(ids),
            ids,
        )
        for (utt, am, ids), lp in zip(entries, lm_scores)
    ]
    by_utt: dict = defaultdict(list)
    for e in rescored:
        by_utt[e[0]].append(e)
    out: List[Tuple[str, float, List[int]]] = []
    for utt in dict.fromkeys(e[0] for e in entries):  # keep utt order
        out.extend(
            sorted(by_utt[utt], key=lambda e: -e[1])
        )
    return out
