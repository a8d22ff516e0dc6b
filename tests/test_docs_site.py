"""Docs-site generator tests (docs/gen_site.py).

The rendered HTML site is the analogue of the reference's sphinx docs
(/root/reference/docs/); these tests pin that generation succeeds, every
public module gets a page, internal links resolve, and reference
citations survive into the rendered output.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SITE = REPO / "docs" / "site"


@pytest.fixture(scope="module")
def site():
    result = subprocess.run(
        [sys.executable, str(REPO / "docs" / "gen_site.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return SITE


def test_all_modules_have_pages(site):
    sys.path.insert(0, str(REPO / "docs"))
    from gen_api_reference import MODULES

    for mod in MODULES:
        page = site / f"{mod}.html"
        assert page.exists(), mod
        assert page.stat().st_size > 500, mod


def test_index_and_guides_render(site):
    index = (site / "index.html").read_text()
    assert "API name index" in index
    assert "DynamicMultinomialHMC" in index
    for guide in ("README", "DESIGN", "BENCHMARKS", "PARITY", "ROADMAP"):
        assert (site / f"{guide}.html").exists(), guide


def test_internal_links_resolve(site):
    missing = set()
    for page in site.glob("*.html"):
        for m in re.finditer(r'href="([^"#]+)(?:#[^"]*)?"', page.read_text()):
            href = m.group(1)
            if href.startswith(("http", "mailto")):
                continue
            if not (site / href).exists():
                missing.add(f"{page.name} -> {href}")
    assert not missing, sorted(missing)[:10]


def test_reference_citations_rendered(site):
    text = (site / "mici_tpu.transitions.html").read_text()
    assert re.search(r"mici/transitions\.py:\d+", text)
    text = (site / "mici_tpu.solvers.html").read_text()
    assert re.search(r"mici/solvers\.py:\d+", text)
