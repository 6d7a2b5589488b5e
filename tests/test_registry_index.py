"""REGISTRY.md must stay in sync with the live registry — the index
is the switch-over map a reference user navigates by. Regenerate with
``PYTHONPATH=/root/repo python tools/gen_registry_index.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_index_in_sync():
    from rsmetacheck_ray.pipelines.queries import registry

    reg = registry()
    text = open(os.path.join(_REPO, "REGISTRY.md")).read()
    listed = {
        line.split("`")[1]
        for line in text.splitlines()
        if line.startswith("| `")
    }
    missing = sorted(set(reg) - listed)
    stale = sorted(listed - set(reg))
    assert not missing and not stale, (
        f"REGISTRY.md out of sync (missing={missing}, stale={stale}); "
        "run tools/gen_registry_index.py"
    )
