"""Execute the demo notebooks' code cells end-to-end (offline, synthetic
weights) — the demos are user-facing surface and must stay runnable."""

import json
import os

import pytest

pytestmark = pytest.mark.slow

DEMOS = os.path.join(os.path.dirname(__file__), "..", "demos")

NOTEBOOKS = [
    "Emoji_Logit_Lens_Demo.ipynb",
    "2_Train_SAE.ipynb",
    "3_Evaluate_SAE.ipynb",
    "Train_CLIP_SAE.ipynb",
]


def test_attribution_demo_executes():
    """demos/06_attribution_patching.py end-to-end: incl_bwd attribution,
    the real-patch sanity check, and the gradient-cut intervention (its
    final asserts are the checks)."""
    import runpy
    import jax
    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("demo sized for the test platform")
    runpy.run_path(os.path.join(DEMOS, "06_attribution_patching.py"),
                   run_name="__main__")


def test_sae_attribution_demo_executes():
    """demos/07_sae_feature_attribution.py end-to-end: error-term splice,
    incl_bwd feature attribution, and the causal ablation check (its final
    asserts are the checks)."""
    import runpy
    import jax
    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("demo sized for the test platform")
    runpy.run_path(os.path.join(DEMOS, "07_sae_feature_attribution.py"),
                   run_name="__main__")


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes(name):
    import matplotlib
    matplotlib.use("Agg")
    with open(os.path.join(DEMOS, name)) as f:
        nb = json.load(f)
    env = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        exec(compile(src, f"{name}[cell {i}]", "exec"), env)  # noqa: S102
