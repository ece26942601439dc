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


def main():
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state, make_jitted_steps

    batch = 8
    hw = 512
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
    print(json.dumps({
        "metric": "unet_train_throughput_512px",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / V100_TF2_BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
