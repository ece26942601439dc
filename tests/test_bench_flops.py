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


def test_cli_strict_parsing():
    """The bench CLI rejects typos, =-form errors, and bad values instead of
    silently running a different geometry (review r3: the hand-rolled token
    scan ignored '--hw=1024' and unknown flags entirely)."""
    import subprocess
    import sys

    def run(*args):
        return subprocess.run([sys.executable, "bench.py", *args],
                              capture_output=True, text=True, timeout=60)

    assert run("--batvh", "16").returncode != 0
    assert run("--hw=abc").returncode != 0
    assert run("--hw").returncode != 0
    assert run("--e2e", "--hw", "1024").returncode != 0  # scope error
    out = run("--help")
    assert out.returncode == 0 and "--batch" in out.stdout
