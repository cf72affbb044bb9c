"""Model container: encoder + one-or-more decoder heads from model.cfg.

Capability parity with nabu/neuralnetworks/models/model.py +
model_factory.py: composes the configured encoder and decoder(s) and
maps ``(inputs, input_lengths, targets, target_lengths)`` to logits +
logit lengths per head. Multiple heads over a shared encoder give the
joint CTC/attention multi-task model (BASELINE.json config 5) — each
head's section carries its ``loss`` and ``loss_weight``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf, ConfigFile
from nabu_tpu.models.decoders import Decoder, build_decoder
from nabu_tpu.models.encoders import Encoder, build_encoder


class Model:
    """Encoder + named decoder heads, all functional pytree modules.

    ``compute_dtype`` (from ``[model] compute_dtype = bfloat16``) casts
    params and features at the model boundary so the whole forward runs
    in bf16 (MXU-native) while parameters, optimizer state and losses
    stay float32 — the standard TPU mixed-precision recipe.
    """

    def __init__(
        self,
        encoder: Encoder,
        decoders: Dict[str, Decoder],
        head_confs: Dict[str, Conf],
        compute_dtype: str = "float32",
        spec_augment: Optional[dict] = None,
    ):
        self.encoder = encoder
        self.decoders = decoders
        self.head_confs = head_confs
        self.compute_dtype = jnp.dtype(compute_dtype)
        # SpecAugment params ([model] spec_augment = true; beyond-parity
        # — see ops/augment.py), applied in-graph at train time only
        self.spec_augment = spec_augment

    def _cast_in(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    # loss spec per head: (loss name, weight)
    def head_loss(self, name: str) -> Tuple[str, float]:
        conf = self.head_confs[name]
        # each Decoder class declares its natural loss (default_loss),
        # so new decoder names/aliases never fall through to the wrong
        # loss; the config's ``loss`` key still overrides
        default = getattr(
            self.decoders[name], "default_loss", "cross_entropy"
        )
        return conf.get("loss", default), conf.getfloat("loss_weight", 1.0)

    def init(self, key) -> dict:
        k_enc, *k_dec = jax.random.split(key, 1 + len(self.decoders))
        return {
            "encoder": self.encoder.init(k_enc),
            "decoders": {
                name: dec.init(k)
                for (name, dec), k in zip(self.decoders.items(), k_dec)
            },
        }

    def encode(self, params, features, lengths, train=False, rng=None):
        with jax.named_scope("encoder"):
            return self.encoder.apply(
                self._cast_in(params["encoder"]),
                self._cast_in(features),
                lengths,
                train=train,
                rng=rng,
            )

    def apply(
        self,
        params: dict,
        features: jnp.ndarray,
        feature_lengths: jnp.ndarray,
        targets: Optional[jnp.ndarray] = None,
        target_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng=None,
        heads=None,
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Returns {head name: (logits, logit_lengths)}.

        ``heads`` restricts which decoder heads run (decode-time callers
        pick one head and need no targets for the others)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        params = self._cast_in(params)
        rng_aug, rng_enc, rng_dec = jax.random.split(rng, 3)
        if train and self.spec_augment is not None:
            from nabu_tpu.ops.augment import spec_augment

            with jax.named_scope("spec_augment"):
                features = spec_augment(
                    rng_aug, features, feature_lengths,
                    **self.spec_augment,
                )
        encoded, enc_lengths = self.encode(
            params, features, feature_lengths, train=train, rng=rng_enc
        )
        outputs = {}
        for name, dec in self.decoders.items():
            if heads is not None and name not in heads:
                continue
            rng_dec, sub = jax.random.split(rng_dec)
            with jax.named_scope(f"decoder_{name}"):
                logits, logit_lengths = dec.apply(
                    params["decoders"][name],
                    encoded,
                    enc_lengths,
                    targets=targets,
                    target_lengths=target_lengths,
                    train=train,
                    rng=sub,
                )
                # losses and decoding run in float32. Exceptions: the
                # 4-D transducer lattice stays in compute dtype — its
                # loss upcasts inside fused reads (ops/transducer.py),
                # and a container-level cast would materialize an f32
                # copy of the largest tensor in the whole step; a dict
                # is the fused-kernel projection handle (use_pallas
                # transducer head) and passes through untouched
                if not isinstance(logits, dict) and logits.ndim < 4:
                    logits = logits.astype(jnp.float32)
                outputs[name] = (logits, logit_lengths)
        return outputs


def build_model(model_cfg: ConfigFile, input_dim: int, num_labels: int) -> Model:
    """Build a Model from a model.cfg file.

    Layout: ``[encoder]`` section selects/configures the encoder;
    ``[model] decoders = name...`` lists head sections (default: the
    single ``[decoder]`` section).
    """
    enc_conf = model_cfg.section("encoder")
    encoder = build_encoder(enc_conf, input_dim)

    model_section = model_cfg.get_section("model")
    if model_section is not None and "decoders" in model_section:
        head_names = model_section.getlist("decoders")
    else:
        head_names = ["decoder"]
    compute_dtype = (
        model_section.get("compute_dtype", "float32")
        if model_section is not None
        else "float32"
    )

    from nabu_tpu.ops.augment import parse_spec_augment_conf

    decoders: Dict[str, Decoder] = {}
    head_confs: Dict[str, Conf] = {}
    for name in head_names:
        conf = model_cfg.section(name)
        decoders[name] = build_decoder(conf, encoder.output_dim, num_labels)
        head_confs[name] = conf
    return Model(
        encoder, decoders, head_confs, compute_dtype,
        spec_augment=parse_spec_augment_conf(model_section),
    )
