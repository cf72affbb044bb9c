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

    sp = sub.add_parser("test", help="score the trained model")
    common(sp)

    sp = sub.add_parser("decode", help="dump n-best hypotheses")
    common(sp)

    sp = sub.add_parser("sweep", help="train model variants from a sweep file")
    common(sp)
    sp.add_argument("--sweep", required=True, help="sweep file")
    return p


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
        from nabu_tpu.scripts import train

        train.main(
            args.recipe,
            args.expdir,
            distributed=args.distributed,
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            num_model_parallel=args.num_model_parallel,
        )
    elif args.command == "test":
        from nabu_tpu.scripts import test

        test.main(args.recipe, args.expdir)
    elif args.command == "decode":
        from nabu_tpu.scripts import decode

        decode.main(args.recipe, args.expdir)
    elif args.command == "sweep":
        from nabu_tpu.scripts import sweep

        sweep.main(args.recipe, args.expdir, args.sweep)
    return 0


if __name__ == "__main__":
    sys.exit(main())
