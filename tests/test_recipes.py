"""The five committed BASELINE recipes must parse and their models,
trainers, and recognizers must build (BASELINE.json:6-12)."""

import os

import jax
import pytest

from nabu_tpu.config import Recipe
from nabu_tpu.models.model import build_model

RECIPES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config",
    "recipes",
)
RECIPES = sorted(
    d for d in os.listdir(RECIPES_DIR) if not d.startswith(".")
)


BASELINE_RECIPES = {
    "ctc_blstm_timit", "dblstm_ctc_wsj", "las_timit",
    "las_large_wsj", "joint_ctc_att_multihost",
}


def test_baseline_recipes_committed():
    """The five BASELINE configs (BASELINE.json:6-12) plus any
    beyond-parity extras (e.g. transformer_ctc_wsj)."""
    assert BASELINE_RECIPES <= set(RECIPES), RECIPES


@pytest.mark.parametrize("name", RECIPES)
def test_recipe_builds(name):
    recipe = Recipe(os.path.join(RECIPES_DIR, name))
    # all config files parse
    for kind in (
        "database", "model", "trainer",
        "validation_evaluator", "test_evaluator", "recognizer",
    ):
        assert recipe.has(kind), f"{name} missing {kind}"
        recipe.file(kind)

    # database sections pair features/targets per split
    db = recipe.database
    sections = set(db.sections())
    for split in ("train", "dev", "test"):
        assert f"{split}features" in sections
        assert f"{split}targets" in sections
        alphabet = db.section(f"{split}targets").getlist("alphabet")
        assert len(alphabet) > 1

    # model builds and initializes
    num_labels = len(db.section("traintargets").getlist("alphabet"))
    feat_conf = db.section("trainfeatures")
    nfilt = feat_conf.getint("nfilt", 40)
    mult = {"nodelta": 1, "delta": 2, "ddelta": 3}[
        feat_conf.get("dynamic", "nodelta")
    ]
    input_dim = nfilt * mult
    model = build_model(recipe.model, input_dim, num_labels)
    params = model.init(jax.random.PRNGKey(0))
    assert params["encoder"]

    # trainer conf names existing database sections
    tconf = recipe.trainer.section("trainer")
    assert tconf["features"] in sections
    assert tconf["targets"] in sections

    # recognizer builds against the model
    from nabu_tpu.decoding.recognizers import build_recognizer

    rec = build_recognizer(recipe.recognizer.section("recognizer"), model)
    assert rec is not None
