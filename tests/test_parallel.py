"""Multi-device SPMD tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.unet import UNet
from tpuseg.parallel import mesh as mesh_lib
from tpuseg.train.steps import create_train_state, make_jitted_steps


def _toy_batch(key, n, h=32, w=32, c=1, classes=2):
    img = jax.random.normal(jax.random.PRNGKey(key), (n, h, w, c))
    lbl = (img[..., 0] > 0).astype(jnp.int32)
    return img, jax.nn.one_hot(lbl, classes)


def test_eight_devices_present():
    assert jax.device_count() == 8


def test_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = mesh_lib.make_mesh(data=4, spatial=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(data=3, spatial=2)


def test_data_parallel_step_runs_and_matches_single_device():
    """DP over 8 devices computes the same loss as single-device on the same
    global batch (modulo float reassociation)."""
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-3)
    pstate = mesh_lib.replicate_state(state, mesh)
    ptstep, pestep = mesh_lib.make_parallel_steps(model, mesh)
    ststep, sestep = make_jitted_steps(model)

    img, lbl = _toy_batch(1, n=8)
    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)

    pmetrics = pestep(pstate, pimg, plbl)
    smetrics = sestep(state, img, lbl)
    np.testing.assert_allclose(float(pmetrics["loss"]), float(smetrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(pmetrics["accuracy"]), float(smetrics["accuracy"]), rtol=1e-6)

    # a train step updates replicated params identically across devices
    new_pstate, m = ptstep(pstate, pimg, plbl)
    assert float(m["loss"]) > 0
    leaf = jax.tree.leaves(new_pstate.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_spatial_partitioning_step():
    """2D (data x spatial) mesh: conv halos handled by GSPMD."""
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(data=4, spatial=2)
    state = mesh_lib.replicate_state(
        create_train_state(model, jax.random.PRNGKey(0), 1, 1e-3), mesh)
    tstep, estep = mesh_lib.make_parallel_steps(model, mesh)
    img, lbl = _toy_batch(2, n=4, h=64)
    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)
    state, metrics = tstep(state, pimg, plbl)
    assert np.isfinite(float(metrics["loss"]))


def test_gradients_are_global_batch_mean():
    """Sharded-batch gradient == full-batch gradient (psum semantics of the
    MirroredStrategy SUM reduce, model.py:233)."""
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    img, lbl = _toy_batch(3, n=8)

    # two independent states from the same seed (donation would otherwise
    # delete buffers shared via device_put aliasing)
    state = create_train_state(model, jax.random.PRNGKey(1), 1, 1e-2)
    pstate = mesh_lib.replicate_state(
        create_train_state(model, jax.random.PRNGKey(1), 1, 1e-2), mesh)
    ptstep, _ = mesh_lib.make_parallel_steps(model, mesh)
    ststep, _ = make_jitted_steps(model)

    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)
    new_p, _ = ptstep(pstate, pimg, plbl)
    new_s, _ = ststep(state, img, lbl)

    p_leaf = np.asarray(jax.tree.leaves(new_p.params)[0])
    s_leaf = np.asarray(jax.tree.leaves(new_s.params)[0])
    np.testing.assert_allclose(p_leaf, s_leaf, atol=2e-5)


def test_optimizer_state_sharding_zero1():
    """ZeRO-1 weight-update sharding: same training result, Adam moments
    physically sharded over the data axis."""
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    img, lbl = _toy_batch(9, n=8)

    state_r = mesh_lib.replicate_state(
        create_train_state(model, jax.random.PRNGKey(4), 1, 1e-2), mesh)
    tstep_r, _ = mesh_lib.make_parallel_steps(model, mesh)

    state_s = create_train_state(model, jax.random.PRNGKey(4), 1, 1e-2)
    tstep_s, estep_s = mesh_lib.make_parallel_steps(
        model, mesh, shard_optimizer=True, state=state_s)
    state_s = mesh_lib.shard_state(state_s, mesh, shard_optimizer=True)

    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)
    new_r, m_r = tstep_r(state_r, pimg, plbl)
    new_s, m_s = tstep_s(state_s, pimg, plbl)

    np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]), rtol=1e-6)
    a = np.asarray(jax.tree.leaves(new_r.params)[0])
    b = np.asarray(jax.tree.leaves(new_s.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-6)

    # a large Adam moment leaf is genuinely sharded (not replicated)
    mu_leaves = [l for l in jax.tree.leaves(new_s.opt_state)
                 if getattr(l, "ndim", 0) == 4 and l.shape[-1] >= 8]
    assert mu_leaves and not mu_leaves[0].sharding.is_fully_replicated

    # and the sharded-state step keeps training
    new_s2, m2 = tstep_s(new_s, pimg, plbl)
    assert np.isfinite(float(m2["loss"]))


def test_raw_steps_zero1_sharding():
    """ZeRO-1 on the raw/device-augment path (make_parallel_raw_steps):
    moments physically sharded, losses match the replicated raw path."""
    model = UNet(num_classes=2, base_features=8, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    raw_img = (jax.random.uniform(jax.random.PRNGKey(11), (8, 32, 32, 1)) * 1000
               ).astype(jnp.uint16)
    raw_msk = (raw_img[..., 0] > 500).astype(jnp.uint8)

    state_r = create_train_state(model, jax.random.PRNGKey(5), 1, 1e-2)
    tstep_r, _ = mesh_lib.make_parallel_raw_steps(model, mesh, 2, augment=False)
    state_r = mesh_lib.replicate_state(state_r, mesh)

    state_s = create_train_state(model, jax.random.PRNGKey(5), 1, 1e-2)
    tstep_s, estep_s = mesh_lib.make_parallel_raw_steps(
        model, mesh, 2, augment=False, shard_optimizer=True, state=state_s)
    state_s = mesh_lib.shard_state(state_s, mesh, shard_optimizer=True)

    sharding = mesh_lib.raw_batch_sharding(mesh)
    pimg = jax.device_put(raw_img, sharding)
    pmsk = jax.device_put(raw_msk, sharding)

    new_r, m_r = tstep_r(state_r, pimg, pmsk)
    new_s, m_s = tstep_s(state_s, pimg, pmsk)
    np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]), rtol=1e-6)

    mu_leaves = [l for l in jax.tree.leaves(new_s.opt_state)
                 if getattr(l, "ndim", 0) == 4 and l.shape[-1] >= 8]
    assert mu_leaves and not mu_leaves[0].sharding.is_fully_replicated

    ev = estep_s(new_s, pimg, pmsk)
    assert np.isfinite(float(ev["loss"]))


# --- BatchNorm cross-replica (sync-BN) semantics, pinned (VERDICT r2 item 2).
# tpuseg intentionally diverges from the reference here: MirroredStrategy
# replicates the graph so each GPU normalizes over its LOCAL shard only
# (/root/reference/UNet/train.py:57 + model.py:36); GSPMD computes BN batch
# statistics over the GLOBAL batch (sync-BN). See models/unet.py docstring.


def test_batchnorm_stats_are_global_batch(monkeypatch):
    """Sharded-batch BN statistics == full-batch single-device statistics:
    the numerical definition of sync-BN. (Per-replica BN would give each
    shard its own mean/var and a different EMA update.)"""
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    img, lbl = _toy_batch(7, n=8)

    state = create_train_state(model, jax.random.PRNGKey(2), 1, 1e-2)
    pstate = mesh_lib.replicate_state(
        create_train_state(model, jax.random.PRNGKey(2), 1, 1e-2), mesh)
    ptstep, _ = mesh_lib.make_parallel_steps(model, mesh)
    ststep, _ = make_jitted_steps(model)

    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)
    new_p, _ = ptstep(pstate, pimg, plbl)
    new_s, _ = ststep(state, img, lbl)

    flat_p = jax.tree_util.tree_leaves_with_path(new_p.batch_stats)
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(new_s.batch_stats)}
    assert flat_p and len(flat_p) == len(flat_s)
    for k, v in flat_p:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_s[jax.tree_util.keystr(k)]),
            atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_batchnorm_sync_collectives_in_compiled_step():
    """Every one of the 23 BN layers inserts a forward batch-stat all-reduce
    in the compiled sharded train step — the collective cost sync-BN pays
    (priced in BASELINE.md: ~55 KB/step, noise next to the ~MB-scale
    gradient reduction)."""
    import functools
    import re

    from tpuseg.train import steps as steps_lib

    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate_state(
        create_train_state(model, jax.random.PRNGKey(0), 1, 1e-3), mesh)
    img, lbl = _toy_batch(0, n=8)
    pimg, plbl = mesh_lib.shard_batch(mesh, img, lbl)
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    compiled = jax.jit(
        functools.partial(steps_lib.train_step, model, steps_lib.make_optimizer()),
        in_shardings=(repl, data, data), out_shardings=(repl, repl),
        donate_argnums=(0,),
    ).lower(state, pimg, plbl).compile()
    txt = compiled.as_text()

    defs = [l for l in txt.splitlines() if re.search(r"= .*all-reduce\(", l)]
    # forward batch-stat all-reduces: BN-attributed, not in the transpose
    # (backward) computation
    fwd_bn = [l for l in defs if "/bn/" in l and "transpose" not in l]
    layers = {m.group(1) for l in fwd_bn
              for m in [re.search(r"/([A-Za-z0-9_]+)/bn/", l)] if m}
    expected = (
        {f"enc{i}{s}" for i in range(1, 5) for s in "ab"}
        | {"bottlenecka", "bottleneckb"}
        | {f"dec{i}{s}" for i in range(1, 5) for s in "ab"}
        | {f"dec{i}up" for i in range(1, 5)}
        | {"head"}
    )
    assert layers == expected, f"missing BN stat sync for {expected - layers}"
