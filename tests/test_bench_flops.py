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


def test_inprocess_hang_triggers_fresh_process_relaunch(monkeypatch):
    """Round-5 live failure: the subprocess probe answered but THIS
    process's backend init hung past the gate, and bench zeroed the
    artifact with 25 min of budget unspent. The gate must instead hand the
    run to _relaunch_in_fresh_process (a fresh process gets a clean
    backend init)."""
    import time as _time

    import pytest

    calls = []
    monkeypatch.setenv("TPUSEG_BENCH_WAIT", "600")
    monkeypatch.setattr(bench, "_subprocess_probe", lambda t: True)
    monkeypatch.setattr(bench, "_inprocess_probe",
                        lambda: _time.sleep(30))  # wedged init
    def _relaunch(deadline):
        calls.append(deadline)
        raise SystemExit(0)  # the real one os._exit()s with the child's rc

    monkeypatch.setattr(bench, "_relaunch_in_fresh_process", _relaunch)
    with pytest.raises(SystemExit):
        bench._require_live_backend("m", "u", timeout_s=0.2)
    assert len(calls) == 1
    assert calls[0] > _time.monotonic()  # handed the live deadline


def test_inprocess_hang_error_line_when_relaunch_declined(monkeypatch,
                                                          capsys):
    """If the relaunch declines (attempt cap / budget / not bench.py), the
    gate still emits the self-describing error line naming the in-process
    failure mode — never a silent hang."""
    import json
    import os
    import time as _time

    import pytest

    monkeypatch.setenv("TPUSEG_BENCH_WAIT", "600")
    monkeypatch.setattr(bench, "_subprocess_probe", lambda t: True)
    monkeypatch.setattr(bench, "_inprocess_probe", lambda: _time.sleep(30))
    monkeypatch.setattr(bench, "_relaunch_in_fresh_process",
                        lambda deadline: None)
    monkeypatch.setattr(os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    with pytest.raises(SystemExit) as e:
        bench._require_live_backend("m", "u", timeout_s=0.2)
    assert e.value.code == 1
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 0.0
    assert "in-process init hang" in rec["error"]


def test_relaunch_declines_outside_bench_and_when_capped(monkeypatch):
    """Never respawn the test runner (argv[0] is pytest here), and never
    loop past the attempt cap."""
    import time as _time

    # under pytest: declines on argv alone, even with budget + attempts
    monkeypatch.delenv("TPUSEG_BENCH_ATTEMPT", raising=False)
    assert bench._relaunch_in_fresh_process(_time.monotonic() + 600) is None

    # as bench.py but out of attempts
    import sys as _sys
    monkeypatch.setattr(_sys, "argv", ["bench.py"])
    monkeypatch.setenv("TPUSEG_BENCH_ATTEMPT", "3")
    assert bench._relaunch_in_fresh_process(_time.monotonic() + 600) is None

    # as bench.py but out of budget
    monkeypatch.setenv("TPUSEG_BENCH_ATTEMPT", "0")
    assert bench._relaunch_in_fresh_process(_time.monotonic() + 10) is None


def test_relaunch_spawns_fresh_bench_with_remaining_budget(monkeypatch):
    """The child is the same bench argv with the attempt counter bumped and
    TPUSEG_BENCH_WAIT rewritten to the REMAINING budget, and the parent
    exits with the child's status."""
    import os
    import subprocess
    import sys as _sys
    import time as _time

    import pytest

    rec = {}

    class _Child:
        returncode = 7

    def _fake_run(cmd, env=None):
        rec["cmd"], rec["env"] = cmd, env
        return _Child()

    monkeypatch.setattr(_sys, "argv", ["bench.py", "--infer"])
    monkeypatch.delenv("TPUSEG_BENCH_ATTEMPT", raising=False)
    monkeypatch.setattr(subprocess, "run", _fake_run)
    monkeypatch.setattr(os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    with pytest.raises(SystemExit) as e:
        bench._relaunch_in_fresh_process(_time.monotonic() + 300)
    assert e.value.code == 7
    assert rec["cmd"] == [_sys.executable, "bench.py", "--infer"]
    assert rec["env"]["TPUSEG_BENCH_ATTEMPT"] == "1"
    assert 240 <= float(rec["env"]["TPUSEG_BENCH_WAIT"]) <= 300


def test_orphan_watchdog_kills_reparented_probe(tmp_path):
    """A bench kill mid-probe must not leak the detached probe subprocess
    (observed live, round 5: the orphan kept polling the tunnel forever).
    Spawn an intermediate parent that launches a watchdog-wrapped child
    then exits immediately; the orphaned child must self-terminate within
    a couple of watchdog periods instead of sleeping out its 60s body."""
    import os
    import subprocess
    import sys
    import time as _time

    pidfile = tmp_path / "child.pid"
    repo_root = os.path.dirname(os.path.abspath(bench.__file__))
    # the intermediate parent bakes ITS pid into the watchdog (the bench
    # contract: a child that samples getppid() itself races a fast parent
    # exit — the site hook's jax pre-import makes child startup slow)
    parent_code = (
        "import os, subprocess, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "code = bench._orphan_watchdog(os.getpid()) + "
        "'import time\\ntime.sleep(60)\\n'\n"
        "p = subprocess.Popen([sys.executable, '-c', code],\n"
        "                     start_new_session=True)\n"
        "open(%r, 'w').write(str(p.pid))\n"
        % (repo_root, str(pidfile)))
    subprocess.run([sys.executable, "-c", parent_code], check=True,
                   timeout=30)  # exits at once, orphaning the child
    pid = int(pidfile.read_text())

    def alive(p):
        try:
            os.kill(p, 0)
            return True
        except ProcessLookupError:
            return False

    deadline = _time.monotonic() + 20.0
    while alive(pid) and _time.monotonic() < deadline:
        _time.sleep(0.5)
    leaked = alive(pid)
    if leaked:
        os.kill(pid, 9)  # don't leave the 60s sleeper behind on failure
    assert not leaked, "orphaned probe child outlived its parent"
