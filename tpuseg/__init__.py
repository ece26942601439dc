"""tpuseg — a TPU-native semantic-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``usnistgov/semantic-segmentation-unet`` (NIST's TF2 U-Net pipeline):

- ``tpuseg.models``   — Flax U-Net (reference arch: /root/reference/UNet/model.py:85-146)
- ``tpuseg.ops``      — losses, metrics, Pallas fused kernels
- ``tpuseg.data``     — native record store (LMDB-role), dataset builder, parallel reader
- ``tpuseg.aug``      — host (reference-parity) and on-device (fused) augmentation
- ``tpuseg.train``    — jitted train/eval steps, training driver, early stopping
- ``tpuseg.infer``    — ERF radius probe + tiled whole-image inference
- ``tpuseg.parallel`` — device mesh, shardings, multi-chip train step
- ``tpuseg.cli``      — reference-compatible CLIs (build_lmdb / train / inference)

Everything on the compute path is jit-compiled for TPU (NHWC, bfloat16 by
default, static shapes); the host runtime around it (record store, reader
workers) uses native C++ where the reference leaned on native libraries.
"""

__version__ = "0.1.0"

SIZE_FACTOR = 16  # 4 pooling halvings; ref model.py:25
RADIUS = 96  # nearest x16 above U-Net paper's 92px context radius; ref model.py:26
