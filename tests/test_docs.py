"""Executable documentation: every fenced Python block in README.md and
docs/*.md runs as a test.

The reference executes all docstring examples as doctests
(/root/reference/test/runtests.jl:84-92) so its docs cannot rot; this is
the same discipline for this repo's markdown docs. Blocks within one file
execute CUMULATIVELY in a shared namespace (they are written as a
progressive tour), seeded with a small preamble defining the free symbols
the fragments assume (x, key, …).
"""

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

_PREAMBLE = """
import matplotlib
matplotlib.use("Agg")
import jax, jax.numpy as jnp
import abstractgps_tpu as agp

key = jax.random.PRNGKey(0)
x = jnp.linspace(0.0, 10.0, 100)
sigma2_vec = 0.1 * jnp.ones(100)
Sigma = 0.1 * jnp.eye(100)
x_grid = jnp.linspace(0.0, 10.0, 25)
x_test = jnp.linspace(0.0, 10.0, 25)
xtest = jnp.linspace(-1.0, 11.0, 20)
x1 = jnp.linspace(0.0, 5.0, 30)
x2 = jnp.linspace(5.0, 10.0, 30)
y1 = jnp.sin(x1)
y2 = jnp.sin(x2)
z2 = jnp.linspace(0.0, 10.0, 7)
"""

_DOC_FILES = sorted(
    [ROOT / "README.md"] + list((ROOT / "docs").glob("*.md")),
    key=lambda p: p.name,
)


def _blocks(path):
    return re.findall(r"```python\n(.*?)```", path.read_text(), re.S)


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", [p for p in _DOC_FILES if _blocks(p)], ids=lambda p: p.name
)
def test_doc_blocks_execute(path):
    import abstractgps_tpu as agp

    ns = {}
    exec(compile(_PREAMBLE, "<preamble>", "exec"), ns)
    try:
        for i, block in enumerate(_blocks(path), 1):
            try:
                exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
            except Exception as e:  # noqa: BLE001 — re-raise with context
                raise AssertionError(
                    f"doc example failed: {path.name} block {i}:\n{block}\n"
                    f"--> {type(e).__name__}: {e}"
                ) from e
    finally:
        # performance.md demonstrates set_matmul_precision; restore default
        agp.set_matmul_precision("high")
        import matplotlib.pyplot as plt

        plt.close("all")
