"""Pinned metric goldens (VERDICT r2 #8).

The oracle tests compare our metric stack against LIVE torch/transformers
re-implementations, so a refactor drifting both sides in tandem passes.
This test pins the calculator's outputs on fixed seeded inputs to values
COMMITTED in tests/goldens/metrics.json (generated once by
scripts/make_metric_goldens.py on the CPU backend). Any numerics change —
deliberate or accidental — fails here and must regenerate the goldens
explicitly. Parity target: /root/reference/evaluation/matrics_calculator.py:274-288.
"""
import json
import os

import jax
import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "metrics.json")

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="goldens are pinned on the CPU backend (TPU numerics differ)")


def test_metric_goldens_pinned():
    assert os.path.exists(GOLDENS), (
        "goldens missing: run JAX_PLATFORMS=cpu python scripts/make_metric_goldens.py")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from make_metric_goldens import compute_goldens

    with open(GOLDENS) as f:
        want = json.load(f)
    got = compute_goldens()
    assert set(got) == set(want)
    for m, w in want.items():
        g = got[m]
        # f32 CPU reruns reproduce to ~1e-5 relative; 1e-3 catches real drift
        assert np.isclose(g, w, rtol=1e-3, atol=1e-5), (
            f"{m}: got {g!r}, golden {w!r} — numerics drifted; if deliberate, "
            "regenerate via scripts/make_metric_goldens.py and justify in the "
            "commit message")
