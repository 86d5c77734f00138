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
