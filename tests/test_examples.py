"""Examples run end-to-end (smoke; small shapes already inside each)."""

import runpy
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "name",
    ["quickstart.py", "diffusion_gated.py", "chain_prior.py", "batch_queries.py"],
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
