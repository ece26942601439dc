"""TRUE multi-process multi-host integration: two OS processes, each with 2
virtual CPU devices, joined via jax.distributed (Gloo collectives), running
the full train_model loop. The monkeypatched multi-host unit tests
(test_distributed.py, test_reader.py) pin the per-piece logic; this pins the
real wiring — jax.distributed.initialize, make_hybrid_mesh over 2 processes,
make_array_from_process_local_data batch assembly, per-host reader
partitioning, and process-0-scoped artifact writes (the r2 data-duplication
bug and three r3 multi-host defects — the device_put startup allgather, the
replicated-leaf checkpoint gather ValueError, and the communicator
rendezvous-vs-compile-skew timeout — all lived in exactly this gap)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

CHILD = textwrap.dedent("""
    import sys

    # the __main__ guard is load-bearing: ImageReader's forkserver workers
    # re-import __main__, and an unguarded jax.distributed.initialize here
    # re-registers this task id with a new incarnation, aborting the fleet
    if __name__ == "__main__":
        proc_id = int(sys.argv[1]); port = sys.argv[2]
        train_db, test_db, out = sys.argv[3:6]
        shard_opt = sys.argv[6] == "1"
        spatial = int(sys.argv[7])
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from tpuseg.utils.compile_cache import enable
        enable()
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=2, process_id=proc_id)
        from tpuseg.train.trainer import TrainConfig, train_model
        result = train_model(TrainConfig(
            train_database=train_db, test_database=test_db, output_folder=out,
            batch_size=1, test_every_n_steps=2, early_stopping_count=1,
            use_augmentation=False, max_epochs=2, dtype="float32",
            base_features=2, seed=0, device_augment=False,
            shard_optimizer=shard_opt, spatial_partitions=spatial))
        print("RESULT", proc_id, result.epochs_run,
              ",".join(f"{v:.6f}" for v in result.test_loss))

        # resume: every process restores host-locally and continues — the
        # multi-host preemption-recovery path (restore -> shard_state ->
        # further global steps). ZeRO-1 variant only: it adds ~3.5 min and
        # the sharded-moment resume is the strictly richer path.
        import os
        ckpt = os.path.join(out, "checkpoint", "ckpt")
        if shard_opt:
            result2 = train_model(TrainConfig(
                train_database=train_db, test_database=test_db,
                output_folder=out + "_resume", batch_size=1,
                test_every_n_steps=2, early_stopping_count=1,
                use_augmentation=False, max_epochs=1, dtype="float32",
                base_features=2, seed=0, device_augment=False,
                shard_optimizer=shard_opt, resume_checkpoint=ckpt))
            print("RESUMED", proc_id, result2.epochs_run,
                  ",".join(f"{v:.6f}" for v in result2.test_loss))

        if proc_id == 0:
            # the checkpoint must restore into a host-side template: with
            # ZeRO-1 this exercises the tiled cross-host moment assembly
            import os
            import numpy as np
            import jax.numpy as jnp
            from tpuseg.models.unet import UNet
            from tpuseg.train import steps
            from tpuseg.utils.checkpoint import restore_train_state
            model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
            template = steps.create_train_state(
                model, jax.random.PRNGKey(0), num_channels=1,
                learning_rate=3e-4)
            restored = restore_train_state(
                os.path.join(out, "checkpoint", "ckpt"), template)
            moments = np.concatenate([
                np.ravel(np.asarray(x)) for x in jax.tree.leaves(restored.opt_state)
                if np.ndim(x)])
            assert np.isfinite(moments).all() and np.abs(moments).sum() > 0
            print("RESTORED", int(restored.step),
                  f"{float(np.abs(moments).sum()):.6f}")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    from tpuseg.data.build_db import serialize_image_mask_pair
    from tpuseg.data.recordstore import RecordWriter

    root = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(0)

    def make(path, n):
        w = RecordWriter(str(path))
        for i in range(n):
            img = rng.normal(500, 100, (32, 32, 1)).astype(np.uint16)
            msk = (img[..., 0] > 500).astype(np.uint8)
            classes = ",".join(str(c) for c in np.unique(msk))
            w.put(f"img{i:03d}:{classes}", serialize_image_mask_pair(img, msk))
        w.close()
        return str(path)

    return make(root / "train-mh.lmdb", 16), make(root / "test-mh.lmdb", 8)


def _launch(script, port, train_db, test_db, out, shard_opt, spatial=1):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + (os.pathsep + env["PYTHONPATH"]
                                if env.get("PYTHONPATH") else "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port),
             train_db, test_db, out, "1" if shard_opt else "0", str(spatial)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=600)
            outs.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.parametrize("shard_opt,spatial", [(False, 1), (True, 1), (False, 2)],
                         ids=["replicated", "zero1", "spatial"])
def test_two_process_train_model(dbs, tmp_path, shard_opt, spatial):
    import jax

    if not hasattr(jax.config, "jax_cpu_collectives_implementation"):
        pytest.skip("this jax has no CPU cross-process collectives")

    train_db, test_db = dbs
    script = tmp_path / "child.py"
    script.write_text(CHILD)

    # one retry: a completely cold persistent compile cache can skew the two
    # processes' first compiles past the Gloo rendezvous window before the
    # warm-up collective itself is compiled; the failed attempt fills the
    # cache, so the retry runs in lockstep
    for attempt in range(2):
        out = str(tmp_path / f"out{attempt}")
        outs = _launch(script, _free_port(), train_db, test_db, out, shard_opt,
                       spatial)
        if all(rc == 0 for rc, _, _ in outs):
            break
        print(f"attempt {attempt} failed:\n{outs[0][1][-1000:]}\n{outs[0][2][-2000:]}")

    for rc, stdout, stderr in outs:
        assert rc == 0, f"child failed:\n{stdout[-2000:]}\n{stderr[-4000:]}"
        # real 2-process topology, not a monkeypatched one; with spatial=2
        # each 2-chip group is one replica, so the global batch halves
        gb = 4 // spatial
        assert f"devices = 4 over 2 host(s), global_batch_size = {gb}" in stdout

    # the loss is a global-batch reduction: both hosts must report the
    # identical trajectory (divergence = desynced streams or broken psums)
    results = [next(l for l in o[1].splitlines() if l.startswith("RESULT"))
               for o in outs]
    assert results[0].split()[2:] == results[1].split()[2:]

    if shard_opt:
        # resume continued from the saved step on both hosts, with matching
        # global losses
        resumed = [next(l for l in o[1].splitlines() if l.startswith("RESUMED"))
                   for o in outs]
        assert resumed[0].split()[2:] == resumed[1].split()[2:]
        assert "Resumed training state" in outs[0][1]

    # process 0 restored the checkpoint into a host template (with ZeRO-1
    # that assembles the cross-host-sharded Adam moments) and verified the
    # moments are finite and non-trivial
    assert any(l.startswith("RESTORED") for l in outs[0][1].splitlines())

    # artifacts written exactly once, by process 0 (trainer scopes
    # checkpoint/TensorBoard/csv to process_index 0)
    assert os.path.isdir(os.path.join(out, "checkpoint", "ckpt"))
    assert os.path.exists(os.path.join(out, "test_loss.csv"))
    tb = [d for d in os.listdir(out) if d.startswith("tensorboard-")]
    assert len(tb) == 1
