"""Model export + serving: a self-contained deployable artifact.

Production-deployment path beyond the reference's capabilities (its
closest is nabu/scripts/decode.py — decode a *prepared dataset* inside
the experiment directory). Here:

- ``run export``: freeze the best-validated checkpoint plus every
  config and resource a recognizer needs (model config, feature
  frontend, alphabet/tokenizer incl. the BPE model, recognizer config
  incl. a fused LM) into ONE directory that is portable across
  machines — no recipe, no expdir, no prepared data required.
- ``load_exported()``: reconstruct a ready recognizer from that
  directory.
- ``run serve``: drive it as a long-running worker speaking a
  line protocol (``utt_id wav_path`` in, ``utt_id hypothesis`` out),
  the standard shape for batch scoring behind a queue or a socket.

The artifact layout::

    export/
      manifest.json     input_dim, num_labels, versions
      params.npz        flattened best-on-dev parameters
      model.cfg         the model architecture sections
      frontend.cfg      [features] + [targets] processing sections
      recognizer.cfg    decode configuration (paths rewritten)
      bpe_model.json    (only when tokenizer = bpe)
      lm.npz            (only when the recognizer fuses an LM)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from typing import IO, List, Optional, Sequence, Tuple

import numpy as np

from nabu_tpu.config import Conf, ConfigFile, Recipe

# keys of a database.conf section that describe where training data
# came from, not how to process audio/text — dropped at export
_DATASET_ONLY_KEYS = ("datafile", "dir", "speed_perturb")


def _flatten_params(params) -> dict:
    import jax

    return {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def _unflatten_params(flat: dict) -> dict:
    params: dict = {}
    for key, value in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return params


def _strip_dataset_keys(section: Conf) -> Conf:
    return Conf(
        {
            k: v
            for k, v in section.items()
            if k not in _DATASET_ONLY_KEYS
        },
        section.name,
    )


def export_model(
    recipe_path: str, expdir: str, out_dir: Optional[str] = None
) -> str:
    """Freeze the experiment's best model into a self-contained
    serving artifact. Returns the artifact directory."""
    import jax

    from nabu_tpu.data.processors import TextProcessor, make_processor
    from nabu_tpu.models.model import build_model
    from nabu_tpu.scripts.test import load_best_params

    recipe = Recipe(recipe_path)
    rconf = recipe.recognizer.section("recognizer").copy()
    feat_name = rconf.get("features", "testfeatures")
    tgt_name = rconf.get("targets", "testtargets")
    feat_sec = _strip_dataset_keys(recipe.database.section(feat_name))
    tgt_sec = _strip_dataset_keys(recipe.database.section(tgt_name))

    out_dir = out_dir or os.path.join(expdir, "export")
    os.makedirs(out_dir, exist_ok=True)

    # resources referenced by path move INTO the artifact
    if tgt_sec.get("bpe_model"):
        shutil.copy(
            tgt_sec["bpe_model"], os.path.join(out_dir, "bpe_model.json")
        )
        tgt_sec.set("bpe_model", os.path.join(out_dir, "bpe_model.json"))
    if rconf.get("lm_path"):
        ext = os.path.splitext(rconf["lm_path"])[1] or ".npz"
        dst = os.path.join(out_dir, f"lm{ext}")
        shutil.copy(rconf["lm_path"], dst)
        rconf.set("lm_path", dst)

    text_proc = TextProcessor(tgt_sec)
    audio_proc = make_processor(feat_sec)
    try:
        input_dim = audio_proc.computer.dim
    except NotImplementedError:
        # rate-dependent frontends (raw frames): fall back to the
        # prepared dataset's recorded dim
        from nabu_tpu.scripts.common import open_dataset

        input_dim = open_dataset(recipe, expdir, feat_name).metadata["dim"]

    model = build_model(recipe.model, input_dim, text_proc.num_labels)
    params = load_best_params(expdir, model)
    flat = _flatten_params(params)
    np.savez(os.path.join(out_dir, "params.npz"), **flat)

    shutil.copy(
        os.path.join(recipe.path, "model.cfg"),
        os.path.join(out_dir, "model.cfg"),
    )
    # the recognizer must read processing sections by FIXED names
    # inside the artifact, independent of the recipe's section naming
    rconf.set("features", "features")
    rconf.set("targets", "targets")
    frontend = ConfigFile(
        {"features": Conf(feat_sec.as_dict(), "features"),
         "targets": Conf(tgt_sec.as_dict(), "targets")},
    )
    frontend.write(os.path.join(out_dir, "frontend.cfg"))
    ConfigFile({"recognizer": Conf(rconf.as_dict(), "recognizer")}).write(
        os.path.join(out_dir, "recognizer.cfg")
    )
    manifest = {
        "framework": "nabu_tpu",
        "input_dim": int(input_dim),
        "num_labels": int(text_proc.num_labels),
        "jax_version": jax.__version__,
        "source_recipe": os.path.abspath(recipe_path),
        "source_expdir": os.path.abspath(expdir),
    }
    if feat_sec.getbool("global_cmvn", False):
        # serving must normalize with the SAME corpus stats training
        # applied at load; freeze the global stats into the artifact
        from nabu_tpu.scripts.common import open_dataset

        stats = open_dataset(recipe, expdir, feat_name).metadata.get(
            "cmvn"
        )
        if not stats:
            raise ValueError(
                "global_cmvn = true but the prepared dataset records "
                "no cmvn stats — re-run `run data`"
            )
        manifest["cmvn"] = {
            "mean": stats["mean"], "std": stats["std"],
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # paths inside the artifact must stay valid after the directory is
    # copied elsewhere: rewrite them relative on a second pass
    _relativize(out_dir)
    return out_dir


def _relativize(out_dir: str) -> None:
    """Rewrite intra-artifact absolute paths to basenames so the
    directory can be moved/shipped."""
    for fname in ("frontend.cfg", "recognizer.cfg"):
        path = os.path.join(out_dir, fname)
        cfg = ConfigFile.read(path)
        changed = False
        for sec_name in cfg.sections():
            sec = cfg.section(sec_name)
            for key in ("bpe_model", "lm_path"):
                v = sec.get(key)
                if v and os.path.dirname(os.path.abspath(v)) == os.path.abspath(
                    out_dir
                ):
                    sec.set(key, os.path.basename(v))
                    changed = True
        if changed:
            cfg.write(path)


class ExportedModel:
    """A recognizer reconstructed from an export artifact."""

    # decode-time padding bucket (frames): one jit compilation per
    # occupied bucket (same contract as scripts/recognize.py)
    T_BUCKET = 512

    def __init__(self, export_dir: str, batch_size: int = 8):
        from nabu_tpu.data.processors import TextProcessor, make_processor
        from nabu_tpu.decoding.recognizers import build_recognizer
        from nabu_tpu.models.model import build_model

        self.dir = os.path.abspath(export_dir)
        with open(os.path.join(self.dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        frontend = ConfigFile.read(os.path.join(self.dir, "frontend.cfg"))
        feat_sec = frontend.section("features").copy()
        tgt_sec = frontend.section("targets").copy()
        # resource paths are artifact-relative (see _relativize)
        for sec, key in ((tgt_sec, "bpe_model"),):
            v = sec.get(key)
            if v and not os.path.isabs(v):
                sec.set(key, os.path.join(self.dir, v))
        rcfg = ConfigFile.read(os.path.join(self.dir, "recognizer.cfg"))
        rconf = rcfg.section("recognizer").copy()
        v = rconf.get("lm_path")
        if v and not os.path.isabs(v):
            rconf.set("lm_path", os.path.join(self.dir, v))

        self.audio_proc = make_processor(feat_sec)
        self.text_proc = TextProcessor(tgt_sec)
        # in-graph frontend (Pallas STFT+Mel on TPU): the serve hot
        # loop computes features on the device; host computers remain
        # as the fallback for configs not representable in-graph (or
        # recognizer.cfg device_frontend = false)
        self.device_fe = None
        if rconf.getbool("device_frontend", True):
            from nabu_tpu.features.jax_frontend import DeviceFrontend

            self.device_fe = DeviceFrontend.make(feat_sec)
        # corpus-level CMVN frozen into the artifact at export
        self.cmvn = None
        if self.manifest.get("cmvn"):
            c = self.manifest["cmvn"]
            self.cmvn = (
                np.asarray(c["mean"], np.float32),
                np.maximum(np.asarray(c["std"], np.float32), 1e-10),
            )
            if self.device_fe is not None:
                self.device_fe.set_normalization(*self.cmvn)
        model_cfg = ConfigFile.read(os.path.join(self.dir, "model.cfg"))
        self.model = build_model(
            model_cfg,
            self.manifest["input_dim"],
            self.manifest["num_labels"],
        )
        with np.load(os.path.join(self.dir, "params.npz")) as z:
            self.params = _unflatten_params({k: z[k] for k in z.files})
        self.rconf = rconf
        self.recognizer = build_recognizer(rconf, self.model)
        self.batch_size = batch_size
        self._streamer = None

    # -- inference --------------------------------------------------------
    def recognize_features(
        self, feats: Sequence[np.ndarray]
    ) -> List[str]:
        """Decode already-computed feature matrices ([T, dim] each)."""
        if self.cmvn is not None:
            feats = [
                (f - self.cmvn[0]) / self.cmvn[1] for f in feats
            ]
        out: List[str] = []
        B = self.batch_size
        for start in range(0, len(feats), B):
            chunk = feats[start: start + B]
            T = max(f.shape[0] for f in chunk)
            T = ((T + self.T_BUCKET - 1) // self.T_BUCKET) * self.T_BUCKET
            batch = np.zeros((B, T, chunk[0].shape[1]), np.float32)
            lengths = np.zeros((B,), np.int32)
            for i, f in enumerate(chunk):
                batch[i, : f.shape[0]] = f
                lengths[i] = f.shape[0]
            res = self.recognizer(self.params, batch, lengths)
            out.extend(
                self.text_proc.ids_to_text(res.best(i))
                for i in range(len(chunk))
            )
        return out

    def recognize_files(self, paths: Sequence[str]) -> List[str]:
        """Decode audio files (wav/SPHERE/pipes, as in datafiles).

        With the device frontend active, features are computed in-graph
        on the accelerator (no host DSP in the hot loop)."""
        if self.device_fe is not None:
            from nabu_tpu.data import audio_io

            out: List[str] = []
            B = self.batch_size
            for start in range(0, len(paths), B):
                chunk = paths[start: start + B]
                loaded = [audio_io.load_audio(p) for p in chunk]
                rates = {rate for _, rate in loaded}
                if len(rates) != 1:  # mixed-rate batch: host fallback
                    out.extend(self.recognize_features(
                        [self.audio_proc.process(p) for p in chunk]
                    ))
                    continue
                feats_dev, flens = self.device_fe.batch_features(
                    [sig for sig, _ in loaded], rates.pop(), B,
                    self.T_BUCKET,
                )
                res = self.recognizer(self.params, feats_dev, flens)
                out.extend(
                    self.text_proc.ids_to_text(res.best(i))
                    for i in range(len(chunk))
                )
            return out
        feats = [self.audio_proc.process(p) for p in paths]
        return self.recognize_features(feats)

    def recognize(self, path: str) -> str:
        return self.recognize_files([path])[0]

    # -- streaming inference ------------------------------------------------
    @property
    def streamer(self):
        """Lazy chunked-transducer session (streaming-capable models:
        forward-only encoder + transducer head, the
        `transducer_streaming` recipes)."""
        if self._streamer is None:
            from nabu_tpu.decoding.streaming import StreamingTransducer

            self._streamer = StreamingTransducer(
                self.model,
                head=self.rconf.get("head"),
                chunk_frames=self.rconf.getint("chunk_frames", 32),
                max_symbols=self.rconf.getint("max_symbols", 4),
            )
        return self._streamer

    def stream_file(self, path: str, on_partial=None) -> str:
        """Decode one file chunk by chunk. After every chunk that
        emits new tokens, ``on_partial(text_so_far)`` is called with
        the full running hypothesis. Returns the final text —
        identical to the offline greedy decode (no lookahead)."""
        feats = self.audio_proc.process(path)
        if self.cmvn is not None:
            feats = (feats - self.cmvn[0]) / self.cmvn[1]
        streamer = self.streamer
        C = streamer.chunk_frames
        T = feats.shape[0]
        Tpad = max(((T + C - 1) // C) * C, C)
        padded = np.zeros((1, Tpad, feats.shape[1]), np.float32)
        padded[0, :T] = feats
        state = streamer.start(self.params, batch=1)
        toks: List[int] = []
        for c0 in range(0, Tpad, C):
            valid = np.clip(T - c0, 0, C)
            new, state = streamer.feed(
                self.params, state, padded[:, c0:c0 + C],
                np.asarray([valid], np.int32),
            )
            if new[0]:
                toks.extend(new[0])
                if on_partial is not None:
                    on_partial(self.text_proc.ids_to_text(toks))
        return self.text_proc.ids_to_text(toks)


def load_exported(export_dir: str, batch_size: int = 8) -> ExportedModel:
    return ExportedModel(export_dir, batch_size=batch_size)


def serve(
    export_dir: str,
    in_stream: Optional[IO[str]] = None,
    out_stream: Optional[IO[str]] = None,
    batch_size: int = 8,
    streaming: bool = False,
) -> int:
    """Line-protocol worker: ``utt_id path`` per input line ->
    ``utt_id hypothesis`` per output line, flushed per batch.

    With ``streaming=True`` (streaming-transducer exports) each
    utterance decodes chunk by chunk, emitting
    ``utt_id PARTIAL <running hypothesis>`` lines as tokens appear and
    a closing ``utt_id FINAL <hypothesis>`` — the incremental-results
    protocol of a live-captioning deployment. The FINAL text is
    identical to the offline decode.

    Already-buffered input lines are micro-batched up to ``batch_size``
    (one padded device call), so piping a whole scp through scores at
    batch throughput — while interactive use still answers per line:
    when no further input is immediately readable, the pending batch
    flushes rather than waiting to fill. Returns the number of
    utterances served.
    """
    in_stream = in_stream if in_stream is not None else sys.stdin
    out_stream = out_stream if out_stream is not None else sys.stdout
    model = load_exported(export_dir, batch_size=batch_size)

    served = 0
    pending: List[Tuple[str, str]] = []

    def more_ready() -> bool:
        try:
            import select

            r, _, _ = select.select([in_stream], [], [], 0.0)
            return bool(r)
        except (OSError, ValueError, TypeError):
            # not selectable (StringIO, pipes on some platforms):
            # batch only up to what arrives before each flush point
            return False

    def flush() -> None:
        nonlocal served
        if not pending:
            return
        texts = model.recognize_files([p for _, p in pending])
        for (utt, _), text in zip(pending, texts):
            out_stream.write(f"{utt} {text}".rstrip() + "\n")
        out_stream.flush()
        served += len(pending)
        pending.clear()

    for line in in_stream:
        line = line.strip()
        if not line:
            flush()  # blank line = explicit flush barrier
            continue
        utt, _, path = line.partition(" ")
        if not path:
            out_stream.write(f"{utt} **ERROR** missing path\n")
            out_stream.flush()
            continue
        if streaming:
            def on_partial(text, utt=utt):
                out_stream.write(f"{utt} PARTIAL {text}".rstrip() + "\n")
                out_stream.flush()

            text = model.stream_file(path.strip(), on_partial=on_partial)
            out_stream.write(f"{utt} FINAL {text}".rstrip() + "\n")
            out_stream.flush()
            served += 1
            continue
        pending.append((utt, path.strip()))
        if len(pending) >= batch_size or not more_ready():
            flush()
    flush()
    return served
