"""Command-line dispatcher: ``run data|train|test|decode|sweep``.

Capability parity with the reference's root ``run`` shell dispatcher +
tf.app.flags CLI (SURVEY.md §1 L9). The ``--mode``/``--computing``
cluster options of the reference map to ``--distributed`` +
``jax.distributed`` coordinator flags (no parameter servers on TPU).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="run", description="TPU-native ASR framework pipeline"
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--recipe", required=True, help="recipe config dir")
        sp.add_argument("--expdir", required=True, help="experiment dir")

    sp = sub.add_parser("data", help="prepare datasets")
    common(sp)
    sp.add_argument("--num_workers", type=int, default=0)

    sp = sub.add_parser("train", help="train a model")
    common(sp)
    sp.add_argument("--distributed", action="store_true")
    sp.add_argument("--coordinator", default=None,
                    help="coordinator host:port for jax.distributed")
    sp.add_argument("--num_processes", type=int, default=None)
    sp.add_argument("--process_id", type=int, default=None)
    sp.add_argument("--num_model_parallel", type=int, default=1,
                    help="model-axis mesh size (GSPMD sharding)")
    sp.add_argument("--num_expert_parallel", type=int, default=1,
                    help="expert-axis mesh size (MoE encoders)")
    sp.add_argument("--num_pipeline", type=int, default=1,
                    help="pipe-axis mesh size (pipeline_stages "
                         "encoders)")
    sp.add_argument("--num_seq_parallel", type=int, default=1,
                    help="seq-axis mesh size (time-sharded attention "
                         "encoders)")
    sp.add_argument("--computing", default="local",
                    choices=["local", "ssh", "condor"],
                    help="where the processes run (the reference's "
                         "--computing=standard|static|condor)")
    sp.add_argument("--computing_conf", default=None,
                    help="INI file with a [computing] section "
                         "(see config/computing/)")

    sp = sub.add_parser(
        "kill", help="stop a cluster run launched with --computing"
    )
    # --expdir identifies the condor job-id record; the ssh path kills
    # by per-host pidfile and needs only the machine list
    sp.add_argument("--expdir", default=None)
    sp.add_argument("--computing", required=True, choices=["ssh", "condor"])
    sp.add_argument("--computing_conf", default=None)

    sp = sub.add_parser("test", help="score the trained model")
    common(sp)

    sp = sub.add_parser("decode", help="dump n-best hypotheses")
    common(sp)

    sp = sub.add_parser("sweep", help="train model variants from a sweep file")
    common(sp)
    sp.add_argument("--sweep", required=True, help="sweep file")

    sp = sub.add_parser(
        "lm", help="train an LM (n-gram or neural) from the training "
        "transcriptions"
    )
    common(sp)
    sp.add_argument("--order", type=int, default=3)
    sp.add_argument("--targets", default="traintargets",
                    help="database.conf targets section to train on")
    sp.add_argument("--type", dest="lm_type", default="ngram",
                    choices=["ngram", "rnn"],
                    help="ngram (Witten-Bell) or rnn (neural LSTM LM)")
    sp.add_argument("--lm_units", type=int, default=256)
    sp.add_argument("--lm_layers", type=int, default=1)
    sp.add_argument("--lm_embed", type=int, default=64)
    sp.add_argument("--lm_steps", type=int, default=500)
    sp.add_argument("--lm_batch", type=int, default=64)
    sp.add_argument("--lm_lr", type=float, default=1e-3)

    sp = sub.add_parser(
        "bpe", help="train a subword (BPE) vocabulary from transcriptions"
    )
    common(sp)
    sp.add_argument("--vocab_size", type=int, default=500)
    sp.add_argument("--targets", default="traintargets")
    sp.add_argument("--out", default=None,
                    help="model path (default <expdir>/bpe/bpe.json)")

    sp = sub.add_parser(
        "rescore", help="LM-rescore a decoded n-best list"
    )
    common(sp)
    sp.add_argument("--lm", default=None, help="LM .npz (from `run lm`)")
    sp.add_argument("--lm_weight", type=float, default=0.3)
    sp.add_argument("--length_bonus", type=float, default=0.0)

    sp = sub.add_parser(
        "align", help="CTC forced alignment of a dataset (CTM output)"
    )
    common(sp)
    sp.add_argument("--features", default=None,
                    help="database.conf features section "
                    "(default: recognizer.cfg's)")
    sp.add_argument("--targets", default=None,
                    help="database.conf targets section "
                    "(default: recognizer.cfg's)")
    sp.add_argument("--head", default=None,
                    help="CTC head name (default: first head with a "
                    "blank_id)")

    sp = sub.add_parser(
        "recognize", help="decode audio files directly (no data prep)"
    )
    common(sp)
    sp.add_argument("audio", nargs="+",
                    help="wav/sph paths, or one Kaldi-style .scp file")
    sp.add_argument("--batch_size", type=int, default=8)

    sp = sub.add_parser(
        "export",
        help="freeze the best model + configs into a portable "
        "serving artifact",
    )
    common(sp)
    sp.add_argument("--output", default=None,
                    help="artifact directory (default: <expdir>/export)")

    sp = sub.add_parser(
        "serve",
        help="long-running recognizer worker over an export artifact "
        "(stdin: 'utt_id wav_path' lines; stdout: 'utt_id hypothesis')",
    )
    sp.add_argument("--export_dir", required=True,
                    help="artifact from `run export`")
    sp.add_argument("--batch_size", type=int, default=8)
    sp.add_argument("--streaming", action="store_true",
                    help="chunked incremental decoding (streaming-"
                    "transducer exports): PARTIAL lines per chunk, "
                    "then a FINAL line per utterance")
    return p


def _computing_conf(path):
    """[computing] section of an INI file (config/computing/*.cfg)."""
    from nabu_tpu.config import Conf, ConfigFile

    if path is None:
        return Conf({}, "computing")
    return ConfigFile.read(path).section("computing")


def _launch_cluster(args) -> int:
    """`run train --computing=ssh|condor`: launch one `run train
    --distributed` process per cluster node (the reference's
    multi_machine mode; SURVEY.md §5 distributed backend — deployment is
    one identical process per host, no parameter servers)."""
    import os

    conf = _computing_conf(args.computing_conf)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.expdir, exist_ok=True)
    extra = " ".join(
        f"--{name}={val}"
        for name, val in [
            ("num_model_parallel", args.num_model_parallel),
            ("num_expert_parallel", args.num_expert_parallel),
            ("num_pipeline", args.num_pipeline),
            ("num_seq_parallel", args.num_seq_parallel),
        ]
        if val != 1
    )
    if args.computing == "ssh":
        from nabu_tpu.computing import ssh_cluster

        cluster_file = conf.get("cluster_file")
        if not cluster_file:
            raise SystemExit(
                "--computing=ssh needs cluster_file in --computing_conf"
            )
        procs = ssh_cluster.launch(
            cluster_file, args.recipe, args.expdir, repo,
            coordinator_port=conf.getint("port", 29500),
            extra_args=extra,
        )
        for proc in procs:
            proc.wait()
        # any nonzero (including signal-death negatives) is a failure
        return 1 if any(p.returncode for p in procs) else 0
    from nabu_tpu.computing import condor

    num_processes = conf.getint("num_processes", args.num_processes or 0)
    coordinator_host = conf.get("coordinator_host")
    if not num_processes or not coordinator_host:
        raise SystemExit(
            "--computing=condor needs num_processes and coordinator_host "
            "in --computing_conf"
        )
    jobids = condor.launch(
        args.expdir, args.recipe, repo, num_processes, coordinator_host,
        coordinator_port=conf.getint("port", 29500),
        dry_run=conf.getbool("dry_run", False),
        request_cpus=conf.getint("request_cpus", 4),
        request_memory=conf.get("request_memory", "8G"),
        requirements=conf.get("requirements", ""),
        extra_args=extra,
    )
    print("submitted:", " ".join(jobids) if jobids else "(dry run)")
    return 0


def _kill_cluster(args) -> int:
    """`run kill`: stop a cluster run (pid-/jobid-exact, never by
    pattern — the reference's kill_processes.sh / condor_rm)."""
    if args.computing == "ssh":
        from nabu_tpu.computing import ssh_cluster

        conf = _computing_conf(args.computing_conf)
        cluster_file = conf.get("cluster_file")
        if not cluster_file:
            raise SystemExit(
                "--computing=ssh needs cluster_file in --computing_conf"
            )
        ssh_cluster.kill(cluster_file)
    else:
        from nabu_tpu.computing import condor

        if not args.expdir:
            raise SystemExit("--computing=condor kill needs --expdir")
        condor.remove(args.expdir)
    return 0


def main(argv=None) -> int:
    # Select the JAX platform explicitly (e.g. NABU_PLATFORM=cpu for
    # host-only runs). Set via jax.config because some environments
    # consume/override JAX_PLATFORMS at interpreter startup.
    platform = os.environ.get("NABU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    args = build_parser().parse_args(argv)
    if args.command == "data":
        from nabu_tpu.scripts import data

        data.main(args.recipe, args.expdir, args.num_workers)
    elif args.command == "train":
        if args.computing != "local":
            return _launch_cluster(args)
        from nabu_tpu.scripts import train

        train.main(
            args.recipe,
            args.expdir,
            distributed=args.distributed,
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            num_model_parallel=args.num_model_parallel,
            num_expert_parallel=args.num_expert_parallel,
            num_pipeline=args.num_pipeline,
            num_seq_parallel=args.num_seq_parallel,
        )
    elif args.command == "kill":
        return _kill_cluster(args)
    elif args.command == "test":
        from nabu_tpu.scripts import test

        test.main(args.recipe, args.expdir)
    elif args.command == "decode":
        from nabu_tpu.scripts import decode

        decode.main(args.recipe, args.expdir)
    elif args.command == "sweep":
        from nabu_tpu.scripts import sweep

        sweep.main(args.recipe, args.expdir, args.sweep)
    elif args.command == "lm":
        from nabu_tpu.scripts import lm

        lm.main(
            args.recipe, args.expdir, args.order, args.targets,
            lm_type=args.lm_type, num_units=args.lm_units,
            num_layers=args.lm_layers, embed_dim=args.lm_embed,
            num_steps=args.lm_steps, batch_size=args.lm_batch,
            learning_rate=args.lm_lr,
        )
    elif args.command == "bpe":
        from nabu_tpu.scripts import bpe

        bpe.main(
            args.recipe, args.expdir, args.vocab_size, args.targets,
            args.out,
        )
    elif args.command == "rescore":
        from nabu_tpu.scripts import rescore

        rescore.main(
            args.recipe, args.expdir, args.lm, args.lm_weight,
            args.length_bonus,
        )
    elif args.command == "align":
        from nabu_tpu.scripts import align

        align.main(
            args.recipe, args.expdir, args.features, args.targets,
            args.head,
        )
    elif args.command == "recognize":
        from nabu_tpu.scripts import recognize

        recognize.main(
            args.recipe, args.expdir, args.audio, args.batch_size
        )
    elif args.command == "export":
        from nabu_tpu.serving import export_model

        out = export_model(args.recipe, args.expdir, args.output)
        print(f"[export] wrote serving artifact to {out}")
    elif args.command == "serve":
        from nabu_tpu.serving import serve

        serve(
            args.export_dir,
            batch_size=args.batch_size,
            streaming=args.streaming,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
