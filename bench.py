"""Benchmark: U-Net training throughput on one TPU chip.

Measures the BASELINE.json headline metric — training images/sec/chip on
512x512 single-channel tiles (full 64-feature U-Net, bf16 compute, fused
jitted train step, synthetic device-resident data so the number is pure
device throughput).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline compares against the reference's V100+TF2 envelope. The
reference publishes no numbers (BASELINE.md), so the bar is the analytic
estimate recorded there: ~436 GFLOPs/image forward, ~1.31 TFLOPs/image
train step; V100 fp32 with typical TF2 conv-net utilization lands at
4.2-6.0 images/sec — bench uses the deliberately conservative 10.0 as the
denominator, so reported multiples are lower bounds.
"""

import json
import sys
import time

V100_TF2_BASELINE_IMG_PER_SEC = 10.0  # analytic estimate, see BASELINE.md
V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak


def _orphan_watchdog(parent_pid: int) -> str:
    """Code preamble for detached children: self-terminate when orphaned,
    even while the main thread is wedged inside a C call (a daemon thread
    stays scheduled). The expected parent pid is BAKED IN by the caller —
    a child that reads ``os.getppid()`` itself races its parent's exit:
    the site hook pre-imports jax into every python process (CLAUDE.md),
    so child startup is slow enough for a fast-exiting parent to have
    already reparented it, freezing the wrong baseline."""
    return (
        "import os, threading, time\n"
        f"_ppid0 = {int(parent_pid)}\n"
        "def _orphan_watch():\n"
        "    while os.getppid() == _ppid0:\n"
        "        time.sleep(5.0)\n"
        "    os._exit(1)\n"
        "threading.Thread(target=_orphan_watch, daemon=True).start()\n")


def _subprocess_probe(timeout_s: float) -> bool:
    """Run one trivial device op in a FRESH python subprocess.

    Subprocess (not thread) because a hung probe must not poison later
    attempts: jax backend initialization is process-global, so a thread
    stuck inside the tunnel's C call would wedge every subsequent
    in-process probe behind the same init lock. A killed subprocess leaves
    this process's (still-uninitialized) backend untouched."""
    import os
    import signal
    import subprocess
    import tempfile

    # The site hook pre-imports jax pinned to the real chip in EVERY python
    # process, ignoring the JAX_PLATFORMS env var (CLAUDE.md); apply it via
    # the config API so the probe targets the same backend the caller will
    # (prod: unset -> real TPU; tests: cpu -> the probe stays hermetic).
    # The watchdog preamble guards the other kill direction: the probe runs
    # detached (own session, so OUR timeout-kill reaches tunnel helpers),
    # which means a kill of bench ITSELF (driver patience, shell timeout)
    # orphans a probe wedged inside the tunnel's C call — observed live,
    # round 5: the orphan kept polling the tunnel indefinitely. A daemon
    # thread (still scheduled while the main thread is stuck in C) exits
    # the probe as soon as its parent changes (reparented to init /
    # subreaper).
    code = (_orphan_watchdog(os.getpid()) +
            "import jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "import jax.numpy as jnp\n"
            "print(float(jnp.ones(()) + 1.0))\n")
    # No pipes: the tunnel plugin can spawn helper processes that inherit
    # them, and after a timeout-kill `communicate()` would then block until
    # the (unkilled) helper exits — observed overrunning the timeout by
    # minutes. Output goes to a temp file; the probe gets its own process
    # group so the kill reaches helpers too.
    try:
        with tempfile.TemporaryFile() as out:
            proc = subprocess.Popen([sys.executable, "-c", code],
                                    stdout=out, stderr=subprocess.DEVNULL,
                                    start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except OSError:
                    pass
                proc.wait(timeout=10.0)
                return False
            out.seek(0)
            return rc == 0 and b"2.0" in out.read()
    except (OSError, subprocess.TimeoutExpired):
        return False


def _inprocess_probe() -> None:
    """One trivial device op with value readback in THIS process (the only
    true sync on the tunneled backend — CLAUDE.md)."""
    import jax.numpy as jnp
    float(jnp.ones(()) + 1.0)


def _relaunch_in_fresh_process(deadline: float) -> None:
    """Last-resort recovery when THIS process's backend init wedges while
    fresh subprocesses reach the chip just fine (observed live, round 5:
    the subprocess probe answered in seconds but the in-process init hung
    past 180s under heavy host load). jax backend init is process-global —
    it cannot be retried in this process — but the whole bench can: re-run
    ``sys.argv`` in a fresh process, which gets a clean backend, and exit
    with its status (the child prints the one JSON line to our inherited
    stdout; no pipes, for the helper-process reason in _subprocess_probe).

    Bounded two ways so the chain cannot loop: ``TPUSEG_BENCH_ATTEMPT``
    caps relaunches at 3, and the child's ``TPUSEG_BENCH_WAIT`` is set to
    the budget REMAINING here, so the total wall clock stays inside the
    original budget. Declines (returns) when out of attempts/budget or when
    not running as bench.py (e.g. under pytest — a test must never respawn
    the test runner)."""
    import os
    import subprocess

    attempt = int(os.environ.get("TPUSEG_BENCH_ATTEMPT", "0"))
    remaining = deadline - time.monotonic()
    if (attempt >= 3 or remaining < 60.0
            or not os.path.basename(sys.argv[0]).endswith("bench.py")):
        return
    print("# bench: in-process backend init wedged but fresh processes "
          f"reach the chip; relaunching in a fresh process (attempt "
          f"{attempt + 1}/3, {remaining:.0f}s of budget left)",
          file=sys.stderr, flush=True)
    child = subprocess.run(
        [sys.executable] + sys.argv,
        env=dict(os.environ,
                 TPUSEG_BENCH_ATTEMPT=str(attempt + 1),
                 TPUSEG_BENCH_WAIT=str(max(60.0, remaining))))
    os._exit(child.returncode)


def _require_live_backend(metric: str, unit: str,
                          timeout_s: float = 180.0) -> None:
    """Wait (bounded) for the tunneled TPU backend instead of hanging OR
    giving up on one coin-flip.

    The backend occasionally goes away entirely — even ``jax.devices()``
    hangs (CLAUDE.md) — and an unguarded bench would block the round-end
    driver indefinitely. Rounds 3 and 4 showed the opposite failure too:
    a single 180s probe lost the round's official artifact to transient
    tunnel weather twice (VERDICT r4 missing #1). So: probe in fresh
    subprocesses, re-trying every ~60s within a total budget
    (``TPUSEG_BENCH_WAIT`` seconds, default 1500 = 25 min, well under the
    driver's patience); emit the self-describing JSON error line and exit
    1 only after the whole budget is spent. After a subprocess probe
    succeeds, one in-process gate (thread + value readback) confirms THIS
    process can reach the device before the expensive compiles start; if
    THAT wedges (process-local init hang — seen once in the wild) the
    bench relaunches itself in a fresh process within the same budget
    (_relaunch_in_fresh_process) rather than zeroing the artifact.
    ``os._exit`` on final failure because a thread stuck inside a C call
    would block normal interpreter shutdown."""
    import os
    import threading

    budget_s = float(os.environ.get("TPUSEG_BENCH_WAIT", "1500"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    alive = _subprocess_probe(min(timeout_s, budget_s))
    while not alive and time.monotonic() < deadline:
        attempt += 1
        wait = min(60.0, max(0.0, deadline - time.monotonic()))
        print(f"# bench: TPU probe {attempt} failed; backend down? "
              f"re-probing in {wait:.0f}s "
              f"({deadline - time.monotonic():.0f}s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(wait)
        if time.monotonic() >= deadline:
            break
        alive = _subprocess_probe(
            min(timeout_s, max(1.0, deadline - time.monotonic())))

    reason = ("trivial device op did not complete within a "
              f"{budget_s:.0f}s retry budget (tunnel down; see CLAUDE.md "
              "environment quirks; budget via TPUSEG_BENCH_WAIT)")
    if alive:
        done = threading.Event()

        def _probe():
            _inprocess_probe()
            done.set()

        threading.Thread(target=_probe, daemon=True,
                         name="tpuseg-bench-probe").start()
        if done.wait(timeout_s):
            return
        # distinct failure mode: fresh subprocesses reach the chip but THIS
        # process's backend init wedged (review r5) — recover by relaunching
        # the bench in a fresh process (exits with the child's status), or
        # fall through to the error line if out of attempts/budget
        _relaunch_in_fresh_process(deadline)
        reason = ("subprocess probe succeeded but this process's backend "
                  f"init did not complete within {timeout_s:.0f}s "
                  "(in-process init hang, not tunnel-down; fresh-process "
                  "relaunch declined or exhausted)")

    # the outage line still carries the last builder-measured battery (with
    # its provenance) so a scoreboard reader is never information-free —
    # clearly labeled as NOT this run's measurement
    print(json.dumps({
        "metric": metric,
        "value": 0.0,
        "unit": unit,
        "vs_baseline": 0.0,
        "error": f"TPU backend unreachable: {reason}",
        "last_builder_measured": {
            "note": "NOT this run: most recent same-chip battery recorded "
                    "in BASELINE.md 'Round 5 measurements' (2026-08-20)",
            "train_512px_batch8_img_per_sec": 74.08,
            "train_mfu_pct": 49.2,
            "infer_int8_blocked_MP_per_sec": 79.77,
            "infer_fp_auto_tile_MP_per_sec": 49.85,
        },
    }), flush=True)
    os._exit(1)


def unet_train_flops_per_image(hw: int, channels: int = 1, classes: int = 2,
                               base: int = 64) -> float:
    """The documented FLOP model (BASELINE.md "Workload FLOP analysis"):
    2*H*W*K^2*Cin*Cout per conv over the reference graph (model.py:85-146),
    deconvs counted with their full 2x2 kernel (the convention the recorded
    436 GF fwd / 1.31 TF step numbers use; a 2x2/stride-2 transposed conv
    only *executes* 1/4 of those MACs, ~12%% of fwd), bwd = 2x fwd."""

    def conv(h, k, cin, cout):
        return 2.0 * h * h * k * k * cin * cout

    fwd = 0.0
    cin, h = channels, hw
    for lvl in range(4):  # encoder
        cout = base << lvl
        fwd += conv(h, 3, cin, cout) + conv(h, 3, cout, cout)
        cin = cout
        h //= 2
    cb = base << 4  # bottleneck
    fwd += conv(h, 3, cin, cb) + conv(h, 3, cb, cb)
    cin = cb
    for lvl in reversed(range(4)):  # decoder
        cout = base << lvl
        h *= 2
        fwd += conv(h, 2, cin, cout)       # deconv
        fwd += conv(h, 3, 2 * cout, cout)  # post-concat conv (skip doubles Cin)
        fwd += conv(h, 3, cout, cout)
        cin = cout
    fwd += conv(hw, 1, base, classes)      # 1x1 head
    return 3.0 * fwd


def _throughput_fields(images_per_sec: float, hw: int) -> dict:
    """MFU evidence attached to every training-bench JSON line so the number
    is self-interpreting (VERDICT r2 weak #3): 74 img/s at 512^2 is ~49% MFU
    on a v5e — chip saturation, not stagnation."""
    flops = unet_train_flops_per_image(hw)
    tflops = images_per_sec * flops / 1e12
    return {
        "tflops_per_sec": round(tflops, 1),
        "mfu": round(tflops / V5E_BF16_PEAK_TFLOPS, 3),
        "peak_tflops": V5E_BF16_PEAK_TFLOPS,
        "flops_per_image": round(flops / 1e9, 1),
    }


def _build_bench_db(root: str, records: int = 64, hw: int = 512) -> str:
    """A small 512^2 database of synthetic uint16 image / uint8 mask tiles,
    written through the real serializer + record store."""
    import numpy as np

    from tpuseg.data.build_db import serialize_image_mask_pair
    from tpuseg.data.recordstore import RecordWriter

    db = f"{root}/train-bench.lmdb"
    rng = np.random.default_rng(0)
    writer = RecordWriter(db)
    try:
        for i in range(records):
            img = rng.integers(0, 4096, size=(hw, hw, 1)).astype(np.uint16)
            msk = (img[..., 0] > 2048).astype(np.uint8)
            writer.put(f"tile{i:04d}:0,1", serialize_image_mask_pair(img, msk))
    finally:
        writer.close()
    return db


def bench_e2e(lmdb: bool = False):
    """End-to-end input pipeline: record store -> forkserver readers (raw
    mode) -> bounded queue -> prefetch device_put -> fused on-device
    augmentation + train step (VERDICT r1 item 3).

    Reports two numbers: the host pipeline rate (readers+queue alone — what
    the chips would be fed at on a real host) and the e2e device rate. In
    this environment host->device goes through a ~7-15 MB/s tunnel
    (CLAUDE.md), so the e2e figure is transfer-bound and the host rate is
    the pipeline-capability signal; on real TPU hosts (PCIe/DMA at GB/s)
    the transfer term vanishes.

    ``lmdb=True`` converts the bench database to the reference's LMDB
    on-disk format and trains straight off it through the pure-Python
    B+tree reader (lmdb_compat.py) — pricing the "bring your reference
    data unconverted" path against tsrstore (VERDICT r3 item 7).
    """
    import tempfile

    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    _require_live_backend("unet_e2e_train_throughput_512px",
                          "images/sec/chip")
    import jax

    from tpuseg.data.reader import ImageReader
    from tpuseg.models.unet import UNet
    from tpuseg.train.prefetch import device_prefetch
    from tpuseg.train.steps import create_train_state, make_jitted_raw_steps

    batch, steps = 8, 30
    with tempfile.TemporaryDirectory() as tmp:
        db = _build_bench_db(tmp)
        if lmdb:
            from tpuseg.cli.convert_db import convert

            lmdb_db = f"{tmp}/train-bench-ref.lmdb"
            convert(db, lmdb_db, "lmdb")
            db = lmdb_db
        reader = ImageReader(db, raw_mode=True, shuffle=True, num_workers=4,
                             number_classes=2, layout="nhwc", seed=0)
        try:
            reader.startup()

            # (a) host pipeline rate: drain stacked raw batches, no device
            host_iter = reader.batches(batch)
            next(host_iter)  # let workers spin up before timing

            def drain_backlog(it):
                # empty the standing queue first: the workers pre-fill up to
                # maxOutQSize samples while the consumer is busy (compiles),
                # and a timed window smaller than that backlog measures pure
                # queue drain, not sustained production (review r3). Bounded
                # at one queue's worth: if producers keep it full against a
                # flat-out consumer, the host isn't the bottleneck at all.
                for _ in range(reader.maxOutQSize // batch + 1):
                    if reader.get_queue_size() <= batch:
                        return
                    next(it)

            drain_backlog(host_iter)
            t0 = time.perf_counter()
            for _ in range(steps):
                next(host_iter)
            host_dt = time.perf_counter() - t0
            host_rate = steps * batch / host_dt
            qdepth = reader.get_queue_size()

            # (b) e2e through prefetch + device: fused augment+train program
            model = UNet(num_classes=2)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       num_channels=1, learning_rate=3e-4)
            tstep, _ = make_jitted_raw_steps(model, num_classes=2, augment=True)
            it = device_prefetch(reader.batches(batch), None)
            imgs, msks = next(it)
            state, m = tstep(state, imgs, msks)  # compile
            float(m["loss"])
            drain_backlog(it)  # the compile window refilled the queue
            t0 = time.perf_counter()
            for _ in range(steps):
                imgs, msks = next(it)
                state, m = tstep(state, imgs, msks)
            float(m["loss"])
            e2e_dt = time.perf_counter() - t0
            e2e_rate = steps * batch / e2e_dt
            mb_per_step = batch * 512 * 512 * 3 / 1e6  # uint16 img + uint8 mask
            it.close()
        finally:
            reader.shutdown()

    print(json.dumps({
        "metric": "unet_e2e_train_throughput_512px"
                  + ("_lmdb" if lmdb else ""),
        "value": round(e2e_rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e_rate / V100_TF2_BASELINE_IMG_PER_SEC, 2),
        "database_format": "reference-lmdb" if lmdb else "tsrstore",
        "host_pipeline_images_per_sec": round(host_rate, 2),
        "reader_queue_depth": qdepth,
        "host_to_device_MB_per_step": round(mb_per_step, 2),
        "transfer_MB_per_sec": round(mb_per_step * e2e_rate / batch, 2),
        **_throughput_fields(e2e_rate, 512),
    }))


def bench_infer():
    """Tiled whole-image inference throughput (BASELINE.md geometry: 4096^2
    uint16, tile 1024, halo 96). Reports device-resident MP/s (the chip
    number) and end-to-end MP/s including the host->device transfer, which
    in this environment rides a ~7-15 MB/s tunnel (CLAUDE.md) — shipping the
    raw uint16 + fusing z-score on device halves those bytes vs the
    reference's float32 send (inference.py:206)."""
    import numpy as np

    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    _require_live_backend("unet_tiled_inference_4096px", "MP/sec/chip")
    import jax.numpy as jnp

    from tpuseg.data.preprocess import zscore_stats
    from tpuseg.infer.tiled import choose_tile_size, inference_tiled, make_predict_fn
    from tpuseg.models.unet import UNet, init_variables
    import jax

    model = UNet(num_classes=2)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1,
                               spatial=(256, 256))
    predict = make_predict_fn(model, variables)

    img = np.random.default_rng(0).integers(0, 4096, size=(4096, 4096)).astype(np.uint16)
    stats = zscore_stats(img)
    mp = img.shape[0] * img.shape[1] / 1e6

    def run(x):
        return inference_tiled(x, predict, num_classes=2, norm_stats=stats)

    run(img)  # compile
    # device-resident: jnp.asarray is a no-op on an on-device array and
    # device_output skips the mask download, so this times pure compute
    # (tile extract + normalize + forward + argmax + stitch); sync is by
    # scalar readback (block_until_ready returns early on this backend)
    dimg = jnp.asarray(img[..., None])

    auto_tile = choose_tile_size(img.shape[0], img.shape[1], 96)

    def run_dev(x, tile, fn=predict):
        out = inference_tiled(x, fn, tile_size=tile, num_classes=2,
                              norm_stats=stats, device_output=True)
        return int(out[0, 0])

    def time_dev(tile, fn=predict):
        run_dev(dimg, tile, fn)  # compile
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run_dev(dimg, tile, fn)
            best = min(best, time.perf_counter() - t0)  # min: tunnel stalls
        return best

    dt_auto = time_dev(auto_tile)  # headline: slot-cost-optimal geometry
    dt_1024 = time_dev(1024)       # the reference's fixed tile (inference.py:24)

    # int8 PTQ serving path (infer/quant.py): same tiled engine, quantized
    # predict_fn, calibrated on a central crop of the same image
    from tpuseg.infer.quant import quantized_predict_from_checkpoint

    # whole-image stats applied to the crop, exactly as the runner
    # calibrates — including the std<=1 mean-shift-only guard
    # (imagereader.py:44-49) the hand-rolled division skipped (review r3)
    mean, std = stats
    safe_std = np.where(np.asarray(std) <= 1.0, 1.0, std)
    crop = (img[1792:2304, 1792:2304].astype("float32") - mean) / safe_std
    qpredict = quantized_predict_from_checkpoint(model, variables, [crop])
    dt_int8 = time_dev(auto_tile, qpredict)

    # space-to-depth-blocked int8 (VERDICT r3 item 2): the C=64 edge stages
    # run on dense (H/2, W/2, 4C) tensors — arithmetically identical masks,
    # different execution plan; this A/B is the measured verdict on it
    qpredict_blocked = quantized_predict_from_checkpoint(
        model, variables, [crop], blocked_edges=True)
    dt_int8_blocked = time_dev(auto_tile, qpredict_blocked)

    t0 = time.perf_counter()
    for _ in range(3):
        run(img)
    dt_e2e = (time.perf_counter() - t0) / 3

    print(json.dumps({
        "metric": "unet_tiled_inference_4096px",
        "value": round(mp / dt_auto, 2),
        "unit": "MP/sec/chip",
        "vs_baseline": round((mp / dt_auto) / 1.9, 2),  # naive host-stitched loop, BASELINE.md
        "auto_tile_size": auto_tile,
        "fixed_1024_MP_per_sec": round(mp / dt_1024, 2),
        "int8_MP_per_sec": round(mp / dt_int8, 2),
        "int8_blocked_MP_per_sec": round(mp / dt_int8_blocked, 2),
        "e2e_MP_per_sec_through_tunnel": round(mp / dt_e2e, 2),
        "host_to_device_MB": round(img.nbytes / 1e6, 1),
    }))


def bench_stream(hw: int = 8192):
    """Whole-slide streaming vs in-RAM inference on the same synthetic slide
    (VERDICT r3 item 5): both paths read a tiled BigTIFF from disk, segment
    it with identical stats/geometry, and write the mask — apples-to-apples
    end-to-end MP/s, plus a mask-agreement check between the two masks.

    Agreement is reported as a fraction, not a strict bool: tiles that take
    different batch shapes between the two paths (the in-RAM program batches
    tiles row-major across the whole grid, so its tile count's remainder can
    run as a small batch; the streaming row program batches per zone row)
    compile to different XLA programs whose bf16 accumulation differs by
    ~1e-3 in logits — enough to flip argmax at near-tie pixels of this
    random-init bench model (measured: 7.8e-5 of pixels, confined to the
    corner tile that runs batch-1 in-RAM vs batch-8 streamed; flipped pixels
    had logit margins <=0.0012 vs 0.028 median). A trained checkpoint's
    margins dwarf this, and on CPU (fp32 programs) the paths are bit-equal
    (tests/test_inference.py::test_streaming_matches_in_ram_tiled pins it)."""
    import os
    import tempfile

    import numpy as np

    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    _require_live_backend(f"unet_streaming_inference_{hw}px", "MP/sec/chip")
    import jax

    from tpuseg.data.preprocess import zscore_stats
    from tpuseg.infer.tiled import (inference_tiled, inference_tiled_streaming,
                                    make_predict_fn, minimize_dtype)
    from tpuseg.models.unet import UNet, init_variables
    from tpuseg.utils.bigtiff import BigTiffReader, write_bigtiff
    from tpuseg.utils.imagio import imwrite

    model = UNet(num_classes=2)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1,
                               spatial=(256, 256))
    predict = make_predict_fn(model, variables)
    mp = hw * hw / 1e6

    with tempfile.TemporaryDirectory() as tmp:
        slide = os.path.join(tmp, "slide.tif")
        img = np.random.default_rng(0).integers(
            0, 4096, size=(hw, hw)).astype(np.uint16)
        write_bigtiff(slide, img, tile=(1024, 1024))
        stats = zscore_stats(img)
        del img

        # (a) streaming: rolling-strip engine, incremental mask write
        out_s = os.path.join(tmp, "mask_stream.tif")
        with BigTiffReader(slide) as reader:  # warm compile pass
            inference_tiled_streaming(reader, predict, out_s, 1024, 96, 8,
                                      num_classes=2, norm_stats=stats,
                                      progress=False)
        t0 = time.perf_counter()
        with BigTiffReader(slide) as reader:
            inference_tiled_streaming(reader, predict, out_s, 1024, 96, 8,
                                      num_classes=2, norm_stats=stats,
                                      progress=False)
        dt_stream = time.perf_counter() - t0

        # (b) in-RAM: whole-slide read, one-transfer tiled program, mask save
        out_r = os.path.join(tmp, "mask_ram.tif")

        def run_ram(fn, out_path):
            with BigTiffReader(slide) as reader:
                whole = reader.read_region(0, 0, reader.height, reader.width)
            mask = inference_tiled(whole, fn, 1024, 96, 8,
                                   num_classes=2, norm_stats=stats)
            imwrite(out_path, minimize_dtype(mask))

        run_ram(predict, out_r)  # warm
        t0 = time.perf_counter()
        run_ram(predict, out_r)
        dt_ram = time.perf_counter() - t0

        with BigTiffReader(out_s) as ms, BigTiffReader(out_r) as mr:
            a = ms.read_region(0, 0, ms.height, ms.width)
            b = mr.read_region(0, 0, mr.height, mr.width)
            agreement = float((a == b).mean())

        # (c) the composed whole-slide production path (VERDICT r4 item 2):
        # rolling-strip streaming x blocked int8 serving. Calibrated on a
        # central window of the slide with the slide's own streaming stats
        # (the runner's recipe); the streaming win is transfer-bound and the
        # int8 win compute-bound, so the two should compose.
        from tpuseg.infer.quant import quantized_predict_from_checkpoint

        mean, std = stats
        safe_std = np.where(np.asarray(std) <= 1.0, 1.0, std)
        with BigTiffReader(slide) as reader:
            crop = reader.read_region(max(0, (hw - 512) // 2),
                                      max(0, (hw - 512) // 2),
                                      min(512, hw), min(512, hw))
        crop = (crop.astype(np.float32) - mean) / safe_std
        qpredict = quantized_predict_from_checkpoint(
            model, variables, [crop], blocked_edges=True)

        out_qs = os.path.join(tmp, "mask_stream_q.tif")

        def run_stream_q():
            with BigTiffReader(slide) as reader:
                inference_tiled_streaming(reader, qpredict, out_qs, 1024, 96,
                                          8, num_classes=2, norm_stats=stats,
                                          progress=False)

        run_stream_q()  # warm compile pass
        t0 = time.perf_counter()
        run_stream_q()
        dt_stream_q = time.perf_counter() - t0

        out_rq = os.path.join(tmp, "mask_ram_q.tif")
        run_ram(qpredict, out_rq)  # warm
        t0 = time.perf_counter()
        run_ram(qpredict, out_rq)
        dt_ram_q = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"unet_streaming_inference_{hw}px",
        "value": round(mp / dt_stream, 2),
        "unit": "MP/sec/chip",
        "vs_baseline": round(dt_ram / dt_stream, 3),  # >=1: streaming not slower
        "in_ram_MP_per_sec": round(mp / dt_ram, 2),
        # the composed production path: disk-to-disk whole-slide serving
        "streamed_int8_blocked_MP_per_sec": round(mp / dt_stream_q, 2),
        "in_ram_int8_blocked_MP_per_sec": round(mp / dt_ram_q, 2),
        # 1.0 on CPU; on TPU >=0.9999 — remainder-batch-shape bf16 tie flips
        # on a random-init model (see docstring), not a geometry difference
        "mask_agreement": round(agreement, 6),
        "slide_MB": round(hw * hw * 2 / 1e6, 1),
    }))


def bench_infer_matrix():
    """Serving-mode decision matrix (VERDICT r4 item 3): fp / int8 /
    int8_blocked measured at the reference 1024-tile geometry and the
    auto-tile geometry across image sizes (2048², 3330², 4096²) plus the
    batched small-image path (the bundled corpus' 256² shape) — the
    measured basis for the README serving-mode table and the int8_auto
    dispatch. Also probes the quantized auto-tile HBM envelope (item 4):
    tiles 1792/2048 at batch 8 on the blocked engine, recording fit-or-OOM.

    All timings are device-resident min-of-4 (value-readback sync); the
    small-image path is timed end-to-end per its engine contract (the
    transfer term is identical across modes)."""
    import numpy as np

    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    _require_live_backend("unet_serving_mode_matrix", "MP/sec/chip")
    import jax
    import jax.numpy as jnp

    from tpuseg.data.preprocess import zscore_stats
    from tpuseg.infer.quant import quantized_predict_from_checkpoint
    from tpuseg.infer.tiled import (choose_tile_size, inference_single_batch,
                                    inference_tiled, make_predict_fn)
    from tpuseg.models.unet import UNet, init_variables

    model = UNet(num_classes=2)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1,
                               spatial=(256, 256))
    rng = np.random.default_rng(0)

    # one calibration crop for every engine (the runner calibrates once per
    # folder, not per geometry)
    big = rng.integers(0, 4096, size=(4096, 4096)).astype(np.uint16)
    big_stats = zscore_stats(big)
    mean, std = big_stats
    safe_std = np.where(np.asarray(std) <= 1.0, 1.0, std)
    crop = (big[1792:2304, 1792:2304].astype(np.float32) - mean) / safe_std

    fns = {
        "fp": make_predict_fn(model, variables),
        "int8": quantized_predict_from_checkpoint(model, variables, [crop]),
        "int8_blocked": quantized_predict_from_checkpoint(
            model, variables, [crop], blocked_edges=True),
    }

    def time_tiled(img, stats, fn, tile):
        dimg = jnp.asarray(img[..., None])

        def run():
            out = inference_tiled(dimg, fn, tile_size=tile, num_classes=2,
                                  norm_stats=stats, device_output=True)
            return int(out[0, 0])

        run()  # compile
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    matrix = {}
    for hw in (2048, 3330, 4096):
        img = big[:hw, :hw] if hw <= 4096 else None
        stats = big_stats if hw == 4096 else zscore_stats(img)
        auto = choose_tile_size(hw, hw, 96)
        mp = hw * hw / 1e6
        for tile, tname in ((1024, "tile1024"), (auto, f"auto{auto}")):
            for mode, fn in fns.items():
                dt = time_tiled(img, stats, fn, tile)
                matrix[f"{hw}_{tname}_{mode}"] = round(mp / dt, 2)
                print(f"# {hw}² {tname} {mode}: {mp / dt:.2f} MP/s",
                      file=sys.stderr, flush=True)

    # batched small-image path (256² corpus shape, batch 8 through one
    # forward; engine contract = host images in, masks out)
    small = [rng.integers(0, 4096, size=(256, 256)).astype(np.uint16)
             for _ in range(32)]
    small_stats = [zscore_stats(s) for s in small]
    for mode, fn in fns.items():
        inference_single_batch(small, fn, 8, stats=small_stats)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            inference_single_batch(small, fn, 8, stats=small_stats)
            best = min(best, time.perf_counter() - t0)
        matrix[f"small256_batch8_{mode}_img_per_sec"] = round(len(small) / best, 2)
        print(f"# small 256² {mode}: {len(small) / best:.2f} img/s",
              file=sys.stderr, flush=True)

    # quantized auto-tile HBM envelope probe (VERDICT r4 item 4): the 1536
    # cap was measured on the bf16 engine; int8_blocked halves inter-block
    # activation bytes, so bigger tiles may fit and shrink the halo share
    envelope = {}
    for tile in (1792, 2048):
        try:
            dt = time_tiled(big, big_stats, fns["int8_blocked"], tile)
            envelope[f"int8_blocked_{tile}"] = round(4096 * 4096 / 1e6 / dt, 2)
            print(f"# envelope int8_blocked tile {tile}: "
                  f"{4096 * 4096 / 1e6 / dt:.2f} MP/s", file=sys.stderr,
                  flush=True)
        except Exception as e:  # XLA OOM surfaces as RuntimeError
            envelope[f"int8_blocked_{tile}"] = f"failed: {type(e).__name__}"
            print(f"# envelope int8_blocked tile {tile}: failed "
                  f"({type(e).__name__})", file=sys.stderr, flush=True)

    # headline key built from the COMPUTED auto tile, not a hardcoded
    # "auto1216": a choose_tile_size default change would otherwise shift
    # the key and silently zero the round's official value (review r5)
    headline = f"4096_auto{choose_tile_size(4096, 4096, 96)}_int8_blocked"
    print(json.dumps({
        "metric": "unet_serving_mode_matrix",
        "value": matrix.get(headline, 0.0),
        "unit": "MP/sec/chip",
        "vs_baseline": 0.0,
        "matrix_MP_per_sec": matrix,
        "envelope_probe": envelope,
    }))


def bench_compile_cost(n_geometries: int = 4):
    """Per-geometry compile cost of the tiled-inference engine (VERDICT r3
    item 9): the reference's dynamic-shape Keras graph (model.py:73) pays
    zero recompiles across heterogeneous image sizes; tpuseg pays a cold
    trace+compile per geometry key (infer/tiled.py program cache). This
    measures that worst case against a COLD persistent cache (fresh temp
    cache dir) and the warm per-call cost after it."""
    import tempfile

    import numpy as np

    from tpuseg.utils import compile_cache

    with tempfile.TemporaryDirectory() as cold_cache:
        compile_cache.enable(cold_cache)
        _require_live_backend("unet_inference_compile_cost", "sec/geometry")
        import jax

        from tpuseg.data.preprocess import zscore_stats
        from tpuseg.infer.tiled import inference_tiled, make_predict_fn
        from tpuseg.models.unet import UNet, init_variables

        model = UNet(num_classes=2)
        variables = init_variables(model, jax.random.PRNGKey(0),
                                   num_channels=1, spatial=(256, 256))
        predict = make_predict_fn(model, variables)

        rng = np.random.default_rng(0)
        cold, warm = [], []
        for k in range(n_geometries):
            hw = 2048 + 256 * k  # distinct geometry keys, realistic sizes
            img = rng.integers(0, 4096, size=(hw, hw)).astype(np.uint16)
            stats = zscore_stats(img)

            def run():
                return inference_tiled(img, predict, 1024, 96, 8,
                                       num_classes=2, norm_stats=stats,
                                       device_output=True)

            t0 = time.perf_counter()
            out = run()
            int(out[0, 0])  # sync
            cold.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(run()[0, 0])
            warm.append(time.perf_counter() - t0)

    print(json.dumps({
        "metric": "unet_inference_compile_cost",
        "value": round(sum(cold) / len(cold), 2),
        "unit": "sec/geometry",
        "vs_baseline": 0.0,  # the reference pays ~0 (dynamic-shape graph)
        "cold_sec_per_geometry": [round(c, 2) for c in cold],
        "warm_sec_per_geometry": [round(w, 2) for w in warm],
        "geometries_px": [2048 + 256 * k for k in range(n_geometries)],
        "note": "cold = trace+lower+compile+run against a fresh persistent "
                "cache; warm = the same call again (program LRU hit). The "
                "persistent cache (~/.cache/tpuseg-xla) makes cold a "
                "once-per-machine cost per geometry.",
    }))


def main(hw: int = 512, batch: int = 8):
    if batch % 8 != 0:
        print(f"# WARNING: --batch {batch} is not a multiple of 8 — TPU "
              "sublane alignment makes such batches ~2x slower per image "
              "(BASELINE.md batch-size sweep); use 8 or 16",
              file=sys.stderr, flush=True)
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    _require_live_backend(f"unet_train_throughput_{hw}px", "images/sec/chip")
    import jax
    import jax.numpy as jnp

    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state, make_jitted_steps
    model = UNet(num_classes=2)  # bf16 compute by default
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1, learning_rate=3e-4)
    tstep, _ = make_jitted_steps(model)

    img = jax.random.normal(jax.random.PRNGKey(1), (batch, hw, hw, 1), jnp.float32)
    lbl = jax.nn.one_hot((img[..., 0] > 0).astype(jnp.int32), 2)

    # compile + warmup; sync via value readback — on the tunneled backend
    # block_until_ready returns before execution finishes, a float() does not
    for _ in range(3):
        state, m = tstep(state, img, lbl)
    float(m["loss"])

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = tstep(state, img, lbl)
    float(m["loss"])  # drains the dependent chain of all `steps` steps
    dt = time.perf_counter() - t0

    images_per_sec = steps * batch / dt
    # vs_baseline stays normalized to the 512^2 workload the 10 img/s V100
    # estimate was priced for (equal-FLOP scaling at other geometries)
    vs = images_per_sec * (hw / 512) ** 2 / V100_TF2_BASELINE_IMG_PER_SEC
    print(json.dumps({
        "metric": f"unet_train_throughput_{hw}px",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2),
        "batch": batch,
        **_throughput_fields(images_per_sec, hw),
    }))


if __name__ == "__main__":
    # argparse, not hand-rolled token scans: '--hw=1024', repeated flags,
    # and typos ('--batvh 16') used to be silently ignored, benching a
    # different geometry than requested (review r3)
    import argparse

    parser = argparse.ArgumentParser(
        prog="bench.py", description="tpuseg benchmark driver")
    parser.add_argument("--e2e", action="store_true",
                        help="input pipeline: readers -> prefetch -> device")
    parser.add_argument("--lmdb", action="store_true",
                        help="with --e2e: train off a reference-format LMDB "
                             "through the pure-Python reader")
    parser.add_argument("--infer", action="store_true",
                        help="tiled inference MP/s (fp, auto-tile, int8, "
                             "int8_blocked)")
    parser.add_argument("--stream", action="store_true",
                        help="streaming vs in-RAM whole-slide A/B on one "
                             "synthetic 8192^2 BigTIFF")
    parser.add_argument("--compile_cost", action="store_true",
                        help="cold/warm per-geometry compile cost of the "
                             "tiled engine against a fresh persistent cache")
    parser.add_argument("--infer_matrix", action="store_true",
                        help="serving-mode decision matrix: fp/int8/"
                             "int8_blocked across geometries + the quantized "
                             "auto-tile envelope probe")
    parser.add_argument("--hw", type=int, default=512,
                        help="square tile size for the training bench")
    parser.add_argument("--batch", type=int, default=8,
                        help="per-chip batch size for the training bench")
    args = parser.parse_args()
    modes = [args.e2e, args.infer, args.stream, args.compile_cost,
             args.infer_matrix]
    if sum(modes) > 1:
        parser.error("--e2e/--infer/--stream/--compile_cost/--infer_matrix "
                     "are mutually exclusive")
    if args.lmdb and not args.e2e:
        parser.error("--lmdb only applies to --e2e")
    if any(modes) and (args.hw != 512 or args.batch != 8):
        parser.error("--hw/--batch only apply to the training bench")
    if args.e2e:
        sys.exit(bench_e2e(lmdb=args.lmdb))
    if args.infer:
        sys.exit(bench_infer())
    if args.stream:
        sys.exit(bench_stream())
    if args.compile_cost:
        sys.exit(bench_compile_cost())
    if args.infer_matrix:
        sys.exit(bench_infer_matrix())
    sys.exit(main(hw=args.hw, batch=args.batch))
