"""The bench's analytic FLOP model must match BASELINE.md's documented
numbers — it is what makes every bench JSON line self-interpreting."""

import bench


def test_flop_model_matches_documented_constants():
    step = bench.unet_train_flops_per_image(512)
    assert abs(step / 3 / 1e9 - 436.3) < 1.0   # fwd ~436 GF (BASELINE.md)
    assert abs(step / 1e12 - 1.309) < 0.005    # step ~1.31 TF


def test_flop_model_scales_with_area():
    assert bench.unet_train_flops_per_image(1024) == (
        4 * bench.unet_train_flops_per_image(512))


def test_throughput_fields_reproduce_roofline():
    f = bench._throughput_fields(74.0, 512)
    assert abs(f["tflops_per_sec"] - 96.9) < 0.5  # ~97 TF/s (BASELINE.md)
    assert abs(f["mfu"] - 0.49) < 0.01


def test_cli_int_rejects_missing_or_bad_values(monkeypatch):
    """--hw with no value (or an adjacent flag) exits with a usage message
    instead of IndexError/silent misparse (review r3)."""
    import pytest

    monkeypatch.setattr("sys.argv", ["bench.py", "--hw", "1024"])
    assert bench._cli_int("--hw", 512) == 1024
    assert bench._cli_int("--batch", 8) == 8  # absent -> default
    monkeypatch.setattr("sys.argv", ["bench.py", "--hw"])
    with pytest.raises(SystemExit, match="requires an integer"):
        bench._cli_int("--hw", 512)
    monkeypatch.setattr("sys.argv", ["bench.py", "--batch", "--hw", "1024"])
    with pytest.raises(SystemExit, match="requires an integer"):
        bench._cli_int("--batch", 8)
    monkeypatch.setattr("sys.argv", ["bench.py", "--hw", "big"])
    with pytest.raises(SystemExit, match="requires an integer"):
        bench._cli_int("--hw", 512)
