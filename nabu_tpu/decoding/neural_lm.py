"""Neural (LSTM) language model: trained on-device, shallow fusion in
every beam search, batched n-best rescoring.

Beyond-parity subsystem (the reference ships no LM at all; this
framework's n-gram module — decoding/lm.py — covers the classic path).
An RNN LM conditions on the FULL history instead of an (order-1)-token
window, which is where LM fusion gains actually come from on subword
and character vocabularies.

Conventions are identical to the n-gram module: vocab = num_labels + 1
and the last id doubles as the sentence boundary (<s> as initial
context, </s> as the final event) — the same id the attention Speller
uses for <sos>/<eos> — so a trained LM plugs into fusion and rescoring
with no id remap.

Fusion interface: ``dense()`` returns a device-side view implementing
the SAME ``init_state(shape) / step(state, token) / logprobs(state)``
contract as ``lm.DenseLM``, except the per-hypothesis state is a
PYTREE ({h_i, c_i, logp}) instead of one int32. The beam searches
treat LM state leaves uniformly (gather over the beam axis,
freeze/advance via ``lm.state_where``), so both LM kinds ride the same
search code. ``logprobs`` is a cached read: the conditional
distribution is computed once per ``step`` and carried in the state.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from nabu_tpu.models import core


def _pack(sequences: Sequence[Sequence[int]], vocab: int):
    """[<s>]+seq inputs, seq+[</s>] targets, padded to a static width.

    The width rounds up to a multiple of 16 so repeated host-side
    scoring calls (rescoring loops, tests) reuse one compiled program
    per 16-wide length bucket instead of compiling per exact length."""
    b = vocab - 1
    N = len(sequences)
    L = max((len(s) for s in sequences), default=0) + 1
    L = ((L + 15) // 16) * 16
    inp = np.zeros((N, L), np.int32)
    tgt = np.zeros((N, L), np.int32)
    lengths = np.zeros((N,), np.int32)
    for i, seq in enumerate(sequences):
        ids = [int(t) for t in seq]
        for t in ids:
            if not 0 <= t < vocab - 1:
                raise ValueError(f"label id {t} out of range")
        n = len(ids) + 1
        inp[i, :n] = [b] + ids
        tgt[i, :n] = ids + [b]
        lengths[i] = n
    return inp, tgt, lengths


class RnnLM:
    """Host-side handle: params + hyperparams, train/save/load/score."""

    def __init__(
        self,
        params: dict,
        num_layers: int,
        num_units: int,
        embed_dim: int,
        vocab: int,
    ):
        self.params = params
        self.num_layers = int(num_layers)
        self.num_units = int(num_units)
        self.embed_dim = int(embed_dim)
        self.vocab = int(vocab)
        self.boundary = self.vocab - 1

    # -- construction --------------------------------------------------------
    @classmethod
    def create(
        cls,
        vocab: int,
        num_units: int = 256,
        num_layers: int = 1,
        embed_dim: int = 64,
        seed: int = 0,
    ) -> "RnnLM":
        import jax

        keys = jax.random.split(jax.random.PRNGKey(seed), num_layers + 2)
        params = {"embed": core.embedding_init(keys[0], vocab, embed_dim)}
        in_dim = embed_dim
        for i in range(num_layers):
            params[f"layer_{i}"] = core.lstm_init(
                keys[i + 1], in_dim, num_units
            )
            in_dim = num_units
        params["proj"] = core.linear_init(keys[-1], num_units, vocab)
        return cls(params, num_layers, num_units, embed_dim, vocab)

    def _loss_fn(self):
        import jax
        import jax.numpy as jnp

        def loss(params, inp, tgt, lengths):
            x = core.embedding_apply(params["embed"], inp)  # [N, L, E]
            for i in range(self.num_layers):
                x = core.lstm_scan(params[f"layer_{i}"], x, lengths)
            logits = core.linear_apply(params["proj"], x)  # [N, L, V]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(
                logp, tgt[..., None], axis=-1
            )[..., 0]  # [N, L]
            mask = (
                jnp.arange(inp.shape[1])[None, :] < lengths[:, None]
            ).astype(jnp.float32)
            return -(tok_lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        return loss

    @classmethod
    def train(
        cls,
        sequences: Sequence[Sequence[int]],
        vocab: int,
        num_units: int = 256,
        num_layers: int = 1,
        embed_dim: int = 64,
        num_steps: int = 500,
        batch_size: int = 64,
        learning_rate: float = 1e-3,
        seed: int = 0,
        log_every: int = 0,
    ) -> "RnnLM":
        """Adam-trained next-token LM over integer label sequences."""
        import jax
        import jax.numpy as jnp
        import optax

        if not sequences:
            raise ValueError(
                "cannot train an LM on an empty corpus (no sequences)"
            )
        self = cls.create(vocab, num_units, num_layers, embed_dim, seed)
        inp, tgt, lengths = _pack(sequences, vocab)
        inp, tgt, lengths = (
            jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(lengths)
        )
        loss_fn = self._loss_fn()
        tx = optax.chain(
            optax.clip_by_global_norm(5.0), optax.adam(learning_rate)
        )

        @jax.jit
        def step(params, opt_state, idx):
            l, grads = jax.value_and_grad(loss_fn)(
                params, inp[idx], tgt[idx], lengths[idx]
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        params = self.params
        opt_state = tx.init(params)
        rng = np.random.default_rng(seed)
        N = inp.shape[0]
        bs = min(batch_size, N)
        for i in range(num_steps):
            idx = jnp.asarray(rng.choice(N, bs, replace=N < bs))
            params, opt_state, loss = step(params, opt_state, idx)
            if log_every and (i + 1) % log_every == 0:
                print(f"[lm] step {i + 1}: loss {float(loss):.4f}")
        self.params = jax.device_get(params)
        return self

    # -- scoring -------------------------------------------------------------
    def seq_logprobs(
        self,
        sequences: Sequence[Sequence[int]],
        include_eos: bool = True,
    ) -> np.ndarray:
        """Batched total log P(seq [</s>]) on device -> [N] float64."""
        import jax
        import jax.numpy as jnp

        if not sequences:
            return np.zeros((0,), np.float64)
        inp, tgt, lengths = _pack(sequences, self.vocab)
        if not include_eos:
            lengths = lengths - 1  # drop the final </s> event
        x = core.embedding_apply(self.params["embed"], jnp.asarray(inp))
        lengths_j = jnp.asarray(lengths)
        for i in range(self.num_layers):
            x = core.lstm_scan(
                self.params[f"layer_{i}"], x, lengths_j
            )
        logits = core.linear_apply(self.params["proj"], x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(
            logp, jnp.asarray(tgt)[..., None], axis=-1
        )[..., 0]
        mask = jnp.arange(inp.shape[1])[None, :] < lengths_j[:, None]
        return np.asarray(
            jax.device_get((tok_lp * mask).sum(axis=1)), np.float64
        )

    def logprob(self, seq: Sequence[int], include_eos: bool = True) -> float:
        """Same contract as NgramLM.logprob (rescore_nbest interface)."""
        return float(self.seq_logprobs([list(seq)], include_eos)[0])

    def perplexity(self, sequences: Sequence[Sequence[int]]) -> float:
        lps = self.seq_logprobs(sequences)
        events = sum(len(s) + 1 for s in sequences)
        return float(np.exp(-lps.sum() / max(events, 1)))

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        import jax

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(
                self.params
            )[0]
        }
        np.savez(
            path,
            kind="rnn",
            num_layers=self.num_layers,
            num_units=self.num_units,
            embed_dim=self.embed_dim,
            vocab=self.vocab,
            **{f"p:{k}": v for k, v in flat.items()},
        )

    @classmethod
    def load(cls, path: str) -> "RnnLM":
        with np.load(path) as z:
            params: dict = {}
            for key in z.files:
                if not key.startswith("p:"):
                    continue
                node = params
                parts = key[2:].split("/")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = z[key]
            return cls(
                params,
                int(z["num_layers"]),
                int(z["num_units"]),
                int(z["embed_dim"]),
                int(z["vocab"]),
            )

    def dense(self) -> "DenseRnnLM":
        import jax

        return DenseRnnLM(
            jax.tree.map(np.asarray, self.params),
            self.num_layers,
            self.vocab,
        )


class DenseRnnLM:
    """Device-side fusion view; state pytree per hypothesis:
    ``{h_i, c_i: [..., H], logp: [..., V]}`` with ``logp`` the cached
    conditional log P(next | history)."""

    def __init__(self, params: dict, num_layers: int, vocab: int):
        import jax.numpy as jnp

        self.params = {
            k: (
                {kk: jnp.asarray(vv) for kk, vv in v.items()}
                if isinstance(v, dict)
                else jnp.asarray(v)
            )
            for k, v in params.items()
        }
        self.num_layers = int(num_layers)
        self.num_units = int(self.params["layer_0"]["wh"].shape[0])
        self.vocab = int(vocab)
        self.boundary = self.vocab - 1

    def _advance(self, state, token):
        import jax
        import jax.numpy as jnp

        x = core.embedding_apply(self.params["embed"], token)
        new = {}
        for i in range(self.num_layers):
            p = self.params[f"layer_{i}"]
            h, c = core.lstm_cell(
                x @ p["wx"] + p["b"], state[f"h_{i}"], state[f"c_{i}"],
                p["wh"],
            )
            new[f"h_{i}"], new[f"c_{i}"] = h, c
            x = h
        logits = core.linear_apply(self.params["proj"], x)
        new["logp"] = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        )
        return new

    def init_state(self, shape):
        """State after consuming <s>: every hypothesis starts with the
        boundary-conditioned distribution."""
        import jax.numpy as jnp

        zeros = {
            k: jnp.zeros(tuple(shape) + (self.num_units,), jnp.float32)
            for i in range(self.num_layers)
            for k in (f"h_{i}", f"c_{i}")
        }
        tok = jnp.full(shape, self.boundary, jnp.int32)
        return self._advance(zeros, tok)

    def step(self, state, token):
        return self._advance(state, token)

    def logprobs(self, state):
        return state["logp"]
