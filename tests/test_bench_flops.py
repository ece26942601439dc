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


def test_backend_probe_passes_on_live_backend():
    # conftest pins the CPU backend, which is always "live": the probe must
    # return quietly without printing anything
    bench._require_live_backend("m", "u", timeout_s=60.0)


def test_backend_probe_times_out_with_error_json(monkeypatch, capsys):
    """When the device op never completes (tunnel down) for the WHOLE retry
    budget, the bench must emit one self-describing JSON error line and exit
    nonzero instead of hanging the round-end driver."""
    import json
    import os

    def _fake_exit(code):
        raise SystemExit(code)

    monkeypatch.setenv("TPUSEG_BENCH_WAIT", "0.2")
    monkeypatch.setattr(bench, "_subprocess_probe", lambda t: False)
    monkeypatch.setattr(os, "_exit", _fake_exit)

    try:
        bench._require_live_backend("unet_train_throughput_512px",
                                    "images/sec/chip", timeout_s=0.05)
        raise AssertionError("expected SystemExit")
    except SystemExit as e:
        assert e.code == 1
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["metric"] == "unet_train_throughput_512px"
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "unreachable" in rec["error"]


def test_backend_probe_retries_through_transient_outage(monkeypatch):
    """VERDICT r4 missing #1: a transient tunnel outage must not cost the
    round's official artifact — the probe re-tries within the budget and
    proceeds once the backend answers."""
    import time as _time

    attempts = []

    def _flaky_probe(timeout_s):
        attempts.append(timeout_s)
        return len(attempts) >= 3  # down twice, then recovers

    sleeps = []
    monkeypatch.setenv("TPUSEG_BENCH_WAIT", "600")
    monkeypatch.setattr(bench, "_subprocess_probe", _flaky_probe)
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))

    # returns quietly: the in-process gate runs on the live CPU backend
    bench._require_live_backend("m", "u", timeout_s=60.0)
    assert len(attempts) == 3
    assert sleeps and all(s <= 60.0 for s in sleeps)
