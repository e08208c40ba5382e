"""The bench's secondary-number plausibility guard (VERDICT r4 weak #1).

Round 4 shipped ``w8_batch4_s_per_image: 0.0137`` — a tunnel dispatch-elision
artifact 165x faster than physics allows — into the official BENCH record.
bench.w8_keys must refuse to report any w8 number outside 0.25x-1.5x of the
bf16 headline and emit a loud ``w8_invalid`` key instead.
"""
import importlib.util
import os

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_valid_w8_reported():
    keys = bench.w8_keys(2.15, 2.26, nb=4)
    assert keys == {"w8_batch4_s_per_image": 2.15,
                    "w8_vs_baseline": round(bench.REF_A100_SECONDS / 2.15, 3)}


def test_r4_artifact_rejected():
    # the exact garbage number that polluted BENCH_r04.json
    keys = bench.w8_keys(0.0137, 2.2647, nb=4)
    assert list(keys) == ["w8_invalid"]
    assert "0.0137" in keys["w8_invalid"]


@pytest.mark.parametrize("s_w8", [0.1, 0.56, 3.5, 100.0])
def test_out_of_band_rejected(s_w8):
    assert "w8_invalid" in bench.w8_keys(s_w8, 2.26, nb=4)


@pytest.mark.parametrize("s_w8", [0.6, 1.5, 2.26, 3.3])
def test_in_band_reported(s_w8):
    assert "w8_invalid" not in bench.w8_keys(s_w8, 2.26, nb=4)


def test_band_is_sane():
    lo, hi = bench.W8_BAND
    assert 0 < lo < 1 < hi
