"""Device mesh + SPMD shardings.

Replaces the reference's ``tf.distribute.MirroredStrategy`` (train.py:57,
model.py:230-235) with GSPMD over a ``jax.sharding.Mesh``:

- **data axis**: the batch dimension is sharded; gradients are averaged by
  XLA-inserted ``psum`` over ICI — the NCCL all-reduce equivalent, but fused
  into the compiled step.
- **spatial axis** (optional): image rows are sharded too; XLA spatially
  partitions the convolutions and inserts halo exchanges. This is the CNN
  analog of sequence parallelism — it lets a global batch *smaller* than the
  device count (or a single huge tile) still use every chip.

Replicated-parameter semantics come free from SPMD: params/optimizer state
carry a fully-replicated sharding, so there is no variable-mirroring
machinery to port (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuseg.train import steps as steps_lib


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a (data, spatial) mesh. Defaults to all local devices on the
    data axis — the MirroredStrategy topology."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """NHWC batch: N over 'data', H over 'spatial' (None on 1-device mesh,
    matching make_parallel_steps' plain-jit fast path)."""
    if mesh.devices.size == 1:
        return None
    return NamedSharding(mesh, P("data", "spatial", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, images, labels) -> Tuple[jax.Array, jax.Array]:
    """Place a host batch onto the mesh (the experimental_distribute_dataset
    moment, train.py:86) — one device_put, no per-replica splitting code."""
    bs = batch_sharding(mesh)
    if bs is None:
        return jax.device_put(images), jax.device_put(labels)
    return jax.device_put(images, bs), jax.device_put(labels, bs)


def optimizer_sharding(state, mesh: Mesh):
    """ZeRO-1-style weight-update sharding (cf. "Automatic Cross-Replica
    Sharding of Weight Update in Data-Parallel Training"): Adam moments are
    pure per-parameter state, so they shard over the 'data' axis — GSPMD
    reduce-scatters the gradients into the shards and each device updates
    1/N of the optimizer state. Leaves whose trailing dim doesn't divide the
    axis stay replicated (the head conv's tiny tensors)."""
    n = mesh.shape["data"]

    def leaf_spec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[-1] > 0 and x.shape[-1] % n == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["data"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_spec, state.opt_state)


def state_shardings(state, mesh: Mesh, shard_optimizer: bool = False):
    """Pytree of NamedShardings matching a TrainState."""
    repl = replicated(mesh)
    tree = jax.tree.map(lambda _: repl, state)
    if shard_optimizer:
        tree = tree.replace(opt_state=optimizer_sharding(state, mesh))
    return tree


def make_parallel_steps(model, mesh: Mesh, label_smoothing: float = 0.0,
                        shard_optimizer: bool = False, state=None):
    """(train_step, eval_step) jitted over the mesh: params replicated,
    batch sharded, optionally optimizer state sharded over 'data'
    (requires ``state`` to derive the sharding tree), donation on. Drop-in
    replacements for the single-device pair from make_jitted_steps.

    On a 1-device mesh the GSPMD annotations are pure overhead (and the
    axon-tunneled TPU backend compiles sharded U-Net programs pathologically
    slowly), so we return the plain jitted pair — bitwise the same program.
    """
    if mesh.devices.size == 1:
        return steps_lib.make_jitted_steps(model, label_smoothing)
    tx = steps_lib.make_optimizer()
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    if shard_optimizer:
        if state is None:
            raise ValueError("shard_optimizer=True needs the state template")
        state_shard = state_shardings(state, mesh, shard_optimizer=True)
    else:
        state_shard = repl

    tstep = jax.jit(
        functools.partial(steps_lib.train_step, model, tx, label_smoothing=label_smoothing),
        in_shardings=(state_shard, data, data),
        out_shardings=(state_shard, repl),
        donate_argnums=(0,),
    )
    estep = jax.jit(
        functools.partial(steps_lib.eval_step, model, label_smoothing=label_smoothing),
        in_shardings=(state_shard, data, data),
        out_shardings=repl,
    )
    return tstep, estep


def raw_batch_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Raw-sample batches shard on 'data' only: the on-device augmentation
    warp gathers across the whole image, so spatial shards would pay
    cross-device gathers for no win at these sizes."""
    if mesh.devices.size == 1:
        return None
    return NamedSharding(mesh, P("data"))


def make_parallel_raw_steps(model, mesh: Mesh, num_classes: int, aug_params=None,
                            augment: bool = True, label_smoothing: float = 0.0,
                            shard_optimizer: bool = False, state=None):
    """Raw-batch (train_step, eval_step) over the mesh: augmentation,
    normalization, one-hot, fwd/bwd, and Adam all in one sharded program.
    ``shard_optimizer=True`` adds ZeRO-1 weight-update sharding of the Adam
    moments over the 'data' axis (requires the ``state`` template)."""
    if mesh.devices.size == 1:
        return steps_lib.make_jitted_raw_steps(
            model, num_classes, aug_params, augment, label_smoothing)
    from tpuseg.aug.device import DeviceAugmentParams, augment_and_preprocess_batch

    if aug_params is None:
        aug_params = DeviceAugmentParams()
    tx = steps_lib.make_optimizer()
    repl = replicated(mesh)
    data = raw_batch_sharding(mesh)
    proc = batch_sharding(mesh)
    if shard_optimizer:
        if state is None:
            raise ValueError("shard_optimizer=True needs the state template")
        state_shard = state_shardings(state, mesh, shard_optimizer=True)
    else:
        state_shard = repl

    # two-program composition (see steps.make_jitted_raw_steps): augment
    # program keeps the data-only sharding; the optimization program takes
    # the full (data x spatial) layout for the conv graph
    split = jax.jit(jax.random.split)
    aug = jax.jit(
        functools.partial(augment_and_preprocess_batch, params=aug_params,
                          num_classes=num_classes, augment=augment),
        in_shardings=(None, data, data), out_shardings=(proc, proc))
    aug_eval = jax.jit(
        functools.partial(augment_and_preprocess_batch, params=aug_params,
                          num_classes=num_classes, augment=False),
        in_shardings=(None, data, data), out_shardings=(proc, proc))
    tstep_inner = jax.jit(
        functools.partial(steps_lib.train_step, model, tx, label_smoothing=label_smoothing),
        in_shardings=(state_shard, proc, proc), out_shardings=(state_shard, repl),
        donate_argnums=(0,))
    estep_inner = jax.jit(
        functools.partial(steps_lib.eval_step, model, label_smoothing=label_smoothing),
        in_shardings=(state_shard, proc, proc), out_shardings=repl)

    # rng threading lives in one place (steps.compose_raw_steps), shared
    # with the single-device raw path
    return steps_lib.compose_raw_steps(split, aug, aug_eval, tstep_inner, estep_inner)


def _put_global(tree, shardings):
    """Place host-initialized leaves onto (possibly process-spanning)
    shardings.

    ``jax.device_put`` of an uncommitted host value whose sharding spans
    every process allgathers the WHOLE value across processes to assert the
    hosts passed identical data (jax dispatch.py `_device_put_sharding_impl`
    → `multihost_utils.assert_equal`) — for a train state that is the entire
    model shipped over DCN at startup, serialized before step one. State
    init is deterministic per seed, so hosts agree by construction; building
    each leaf from per-device local buffers (`make_array_from_callback`)
    creates the same global array with zero cross-process traffic."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        try:
            host = np.asarray(x)
        except TypeError:  # extended dtypes (typed PRNG keys): let jax check
            return jax.device_put(x, s)
        return jax.make_array_from_callback(host.shape, s,
                                            lambda idx: host[idx])

    return jax.tree.map(put, tree, shardings)


def warm_collectives(mesh: Mesh) -> None:
    """Establish the mesh's cross-process communicator before the first
    expensive-to-compile program needs it.

    Communicator rendezvous has a finite window (XLA:CPU gloo ~30s; ICI
    channel setup is likewise bounded), while first-compile of the train
    step takes minutes and is NOT synchronized across hosts (per-host
    compile caches) — so without this, the fastest host launches step one
    and times out its rendezvous while a peer is still compiling. One tiny
    psum compiles in seconds on every host nearly simultaneously; the
    communicator it establishes for this device clique is reused by every
    later program on the mesh."""
    if jax.process_count() == 1 or mesh.devices.size == 1:
        return
    import jax.numpy as jnp

    n = mesh.devices.size
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    host = np.ones((n,), np.float32)
    arr = jax.make_array_from_callback((n,), sh, lambda idx: host[idx])
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    total = float(np.asarray(out.addressable_data(0)))  # sync: must have run
    if total != float(n):
        raise RuntimeError(
            f"mesh warm-up psum returned {total}, expected {n}: "
            "cross-process collectives are broken")


def replicate_state(state, mesh: Mesh):
    """Place a host-initialized train state replicated across the mesh."""
    if mesh.devices.size == 1:
        return state
    return _put_global(state, jax.tree.map(lambda _: replicated(mesh), state))


def shard_state(state, mesh: Mesh, shard_optimizer: bool = False):
    """Place a host-initialized train state on the mesh, optionally with the
    optimizer moments sharded over 'data' (see optimizer_sharding)."""
    if mesh.devices.size == 1:
        return state
    return _put_global(state, state_shardings(state, mesh, shard_optimizer))
