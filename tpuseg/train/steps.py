"""Jitted train/eval steps.

The reference's per-replica ``train_step`` (model.py:204-228) — forward,
CCE loss, backward, Adam update, metric update — becomes **one** jit-compiled
XLA program with donated state: forward+backward+optimizer fuse into a single
device launch, no Python between micro-ops, no host<->device sync except the
scalar metrics the driver chooses to read.

Learning-rate warmup (train.py:126-132 sets lr/10 for the first epoch) is a
traced scalar carried in the train state, so changing it does NOT recompile.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpuseg.models.unet import UNet, init_variables
from tpuseg.ops.losses import categorical_accuracy, cce_from_logits, reference_scalar_loss


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    lr: jax.Array  # traced: warmup changes don't recompile
    rng: jax.Array


class _KerasAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def _scale_by_keras_adam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam with TF/Keras update semantics (optimizer_v2 Adam, the optimizer
    the reference builds at model.py:79):

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        var -= lr_t * m_t / (sqrt(v_t) + eps)

    i.e. epsilon is added to the UNCORRECTED sqrt(v_t). ``optax.adam`` adds
    it to the bias-corrected sqrt(v_hat) instead, which makes its effective
    epsilon ~31.6x smaller at step 1 (1/sqrt(1-b2^t)) — a measurable
    step-for-step divergence from the reference early in training
    (review r3). Pinned against a live tf.keras Adam in test_train_steps.
    """

    def init_fn(params):
        return _KerasAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, updates)
        count = state.count + 1
        c = count.astype(jnp.float32)
        scale = jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        out = jax.tree.map(lambda m, v: scale * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, _KerasAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def keras_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    return optax.chain(_scale_by_keras_adam(b1, b2, eps),
                       optax.scale_by_learning_rate(learning_rate))


def make_optimizer() -> optax.GradientTransformation:
    """Adam with Keras defaults AND Keras update semantics (b1=0.9, b2=0.999,
    eps=1e-7 applied to the uncorrected sqrt(v); model.py:79) and a
    runtime-injected learning rate."""
    return optax.inject_hyperparams(
        keras_adam, static_args=("b1", "b2", "eps"))(learning_rate=0.0)


def create_train_state(model: UNet, rng: jax.Array, num_channels: int, learning_rate: float,
                       spatial=(16, 16)) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = init_variables(model, init_rng, num_channels, spatial=spatial)
    tx = make_optimizer()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        lr=jnp.asarray(learning_rate, jnp.float32),
        rng=state_rng,
    )


def train_step(model: UNet, tx: optax.GradientTransformation, state: TrainState,
               images: jax.Array, labels: jax.Array, label_smoothing: float = 0.0,
               ) -> Tuple[TrainState, dict]:
    """One fused optimization step.

    images: [N,H,W,C] float32 (already normalized); labels: [N,H,W,classes]
    one-hot. Loss scaling follows model.py:211-215 with global batch = N.
    """
    rng, dropout_rng = jax.random.split(state.rng)
    global_batch = images.shape[0]

    def loss_fn(params):
        logits, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        per_pixel = cce_from_logits(logits, labels, label_smoothing)
        loss = reference_scalar_loss(per_pixel, global_batch)
        return loss, (logits, updates["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    # inject_hyperparams exposes the lr as a leaf; rebuild the container
    # functionally — writing into state.opt_state.hyperparams would mutate
    # the CALLER's state in eager (un-jitted) use (review r3)
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = state.lr
    opt_state = state.opt_state._replace(hyperparams=hp)
    updates, new_opt_state = tx.update(grads, opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    metrics = {
        "loss": loss,
        "accuracy": categorical_accuracy(logits, labels),
    }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
        rng=rng,
    )
    return new_state, metrics


def eval_step(model: UNet, state: TrainState, images: jax.Array, labels: jax.Array,
              label_smoothing: float = 0.0) -> dict:
    """model.py:237-250: forward in inference mode, same loss scaling."""
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False,
    )
    per_pixel = cce_from_logits(logits, labels, label_smoothing)
    loss = reference_scalar_loss(per_pixel, images.shape[0])
    return {"loss": loss, "accuracy": categorical_accuracy(logits, labels)}


def make_jitted_steps(model: UNet, label_smoothing: float = 0.0):
    """Single-device jitted (train_step, eval_step) pair with donated state."""
    tx = make_optimizer()
    tstep = jax.jit(
        functools.partial(train_step, model, tx, label_smoothing=label_smoothing),
        donate_argnums=(0,),
    )
    estep = jax.jit(functools.partial(eval_step, model, label_smoothing=label_smoothing))
    return tstep, estep


def compose_raw_steps(split, aug_train, aug_eval, tstep_inner, estep_inner):
    """Thread the RNG through the two-program (augment, optimize)
    composition — the single definition of the rng convention shared by the
    single-device and mesh-sharded raw paths (parallel.mesh builds the same
    composition over sharded programs; a divergence here silently forks the
    two paths' RNG semantics)."""

    def _train(state: TrainState, raw_images, raw_masks):
        rng, aug_rng = split(state.rng)
        images, labels = aug_train(aug_rng, raw_images, raw_masks)
        return tstep_inner(state.replace(rng=rng), images, labels)

    def _eval(state: TrainState, raw_images, raw_masks):
        # rng is unused with augment=False; fold_in anyway so eval never
        # hands the live training key to another consumer
        images, labels = aug_eval(jax.random.fold_in(state.rng, 1),
                                  raw_images, raw_masks)
        return estep_inner(state, images, labels)

    return _train, _eval


def make_jitted_raw_steps(model: UNet, num_classes: int, aug_params=None,
                          augment: bool = True, label_smoothing: float = 0.0):
    """(train_step, eval_step) over RAW uint batches: on-device augmentation,
    z-score, and one-hot run on device before fwd/bwd/Adam — the TPU
    replacement for the reference's host augmentation pipeline
    (imagereader.py:283-312). Workers then only ship compact raw bytes.

    The augmentation and optimization stages are two separately-jitted
    programs composed in Python: the batch never leaves the device between
    them, the gather-heavy warp can't fuse into the conv graph anyway, and
    one giant module compiles pathologically slowly on some backends
    (~18 min fused vs seconds split, on the tunneled TPU here)."""
    from tpuseg.aug.device import DeviceAugmentParams, augment_and_preprocess_batch

    if aug_params is None:
        aug_params = DeviceAugmentParams()
    split = jax.jit(jax.random.split)
    # the optimization pair is exactly the single-device one — one
    # definition of the jit/donation wiring for both paths
    tstep_inner, estep_inner = make_jitted_steps(model, label_smoothing)

    aug_train = functools.partial(augment_and_preprocess_batch, params=aug_params,
                                  num_classes=num_classes, augment=augment)
    aug_eval = functools.partial(augment_and_preprocess_batch, params=aug_params,
                                 num_classes=num_classes, augment=False)
    return compose_raw_steps(split, aug_train, aug_eval, tstep_inner, estep_inner)
