"""`run sweep`: train and test model variants from a sweep file.

Capability parity with nabu/scripts/sweep.py: each block of
``file/section/key value`` lines in the sweep file patches the recipe;
every variant trains into its own expdir subdirectory and is scored.
"""

from __future__ import annotations

import os
import shutil

from nabu_tpu.config import (
    RECIPE_FILES,
    Recipe,
    apply_sweep_overrides,
    parse_sweep_file,
)


def main(recipe_path: str, expdir: str, sweep_path: str) -> None:
    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import test as test_script
    from nabu_tpu.scripts import train as train_script

    blocks = parse_sweep_file(sweep_path)
    os.makedirs(expdir, exist_ok=True)
    for i, overrides in enumerate(blocks):
        sub_expdir = os.path.join(expdir, f"sweep_{i}")
        # materialize the patched recipe so the variant is reproducible
        sub_recipe = os.path.join(sub_expdir, "recipe")
        os.makedirs(sub_recipe, exist_ok=True)
        for fname in RECIPE_FILES.values():
            src = os.path.join(recipe_path, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(sub_recipe, fname))
        recipe = Recipe(sub_recipe)
        apply_sweep_overrides(recipe, overrides)
        for kind, f in recipe._files.items():
            f.write(os.path.join(sub_recipe, RECIPE_FILES.get(kind, kind)))

        print(f"[sweep] variant {i}: {overrides}")
        data_script.main(sub_recipe, sub_expdir)
        train_script.main(sub_recipe, sub_expdir)
        metric = test_script.main(sub_recipe, sub_expdir)
        print(f"[sweep] variant {i} metric: {metric:.4f}")
