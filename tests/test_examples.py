"""Examples run end-to-end (smoke; small shapes already inside each)."""

import runpy
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "name",
    [
        "quickstart.py",
        "diffusion_gated.py",
        "chain_prior.py",
        "batch_queries.py",
        "rag_replacement.py",
    ],
)
def test_example_runs(name, capsys):
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip()  # produced output, no exception


def test_hierarchical_example(capsys):
    runpy.run_path(
        os.path.join(EXAMPLES, "hierarchical_scale.py"), run_name="__main__"
    )
    assert "composed deltaH" in capsys.readouterr().out


NOTEBOOKS = os.path.join(os.path.dirname(EXAMPLES), "notebooks")


@pytest.mark.parametrize(
    "name",
    [
        "01_quickstart.ipynb",
        "02_energy_landscape.ipynb",
        "03_constraint_query.ipynb",
        "04_hallucination_gating.ipynb",
        "05_scaling_tiers.ipynb",
        "06_rerank_modes.ipynb",
    ],
)
def test_notebook_code_cells_run(name, tmp_path, monkeypatch):
    """Every notebook's code cells execute in order without error."""
    import json

    monkeypatch.chdir(tmp_path)  # notebooks may save figures to cwd
    with open(os.path.join(NOTEBOOKS, name), encoding="utf-8") as f:
        nb = json.load(f)
    env: dict = {}
    for cell in nb["cells"]:
        if cell["cell_type"] == "code":
            exec("".join(cell["source"]), env)  # noqa: S102
