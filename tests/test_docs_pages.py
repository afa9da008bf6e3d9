"""Execute every python code block in the tutorial docs pages.

The reference's docs are built with Documenter.jl `@example` blocks
that run at doc-build time; this test is the equivalent gate — each
page's ```python blocks execute top to bottom in one shared namespace,
so the tutorials cannot rot.
"""

import os
import re

import pytest

pytestmark = pytest.mark.integration

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")

PAGES = [
    "priors.md",
    "derived.md",
    "custom-likelihood.md",
    "data-simulation.md",
    "gaia-dr4-simulation.md",
    "post-pred.md",
    "thiele-innes.md",
    "images.md",
    "interferometry.md",
    "transits.md",
    "mass-photometry.md",
    "limits-completeness.md",
    "sbc.md",
    "cross-validation.md",
    "model-comparison.md",
    "faq.md",
    "migration.md",
    "extract-phot-astrom.md",
    "api.md",
    "pma.md",
    "hipparcos.md",
    "fit-coplanar.md",
    "rv-multi-planet.md",
    "fit-rv-rel.md",
    "chains-io.md",
    "quickstart.md",
    "rv.md",
    "data-acquisition.md",
    "g23h.md",
    "rv-gp.md",
    "astrom-pma-rv.md",
    "orbits.md",
    "absolute-astrometry.md",
    "samplers.md",
    "plotting.md",
    "parallel-sampling.md",
]

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(page):
    text = open(os.path.join(DOCS, page)).read()
    return _BLOCK_RE.findall(text)


@pytest.mark.parametrize("page", PAGES)
def test_docs_page_code_runs(page, tmp_path, monkeypatch):
    blocks = _blocks(page)
    assert blocks, f"{page}: no python code blocks found"
    # run in a scratch dir so pages may write figures
    monkeypatch.chdir(tmp_path)
    ns = {"__name__": f"docs_{page.replace('.', '_').replace('-', '_')}"}
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"{page}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{page} block {i} failed: {type(e).__name__}: {e}\n{code}"
            ) from e
