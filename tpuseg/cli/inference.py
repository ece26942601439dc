"""CLI: run tiled whole-image inference with a trained checkpoint.

Flags mirror the reference ``UNet/inference.py:231-241``.
"""

import argparse

from tpuseg.infer.runner import InferenceConfig, inference


def main(argv=None):
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    parser = argparse.ArgumentParser(
        prog="inference",
        description="Script to inference (segment) a folder of images with the "
                    "selected unet model")
    parser.add_argument("--checkpoint_filepath", dest="checkpoint_filepath", type=str,
                        help="Checkpoint filepath to the model to use", required=True)
    parser.add_argument("--image_folder", dest="image_folder", type=str,
                        help="filepath to the folder containing tif images to inference "
                             "(Required)", required=True)
    parser.add_argument("--output_folder", dest="output_folder", type=str, required=True)
    parser.add_argument("--number_classes", dest="number_classes", type=int, required=True)
    parser.add_argument("--number_channels", dest="number_channels", type=int, required=True)
    parser.add_argument("--image_format", dest="image_format", type=str,
                        help="format (extension) of the input images. E.g {tif, jpg, png)",
                        default="tif")
    # --- tpuseg extensions ---
    parser.add_argument("--tile_size", dest="tile_size", type=int, default=1024,
                        help="tile size for large-image tiling (tpuseg extension)")
    parser.add_argument("--batch_size", dest="batch_size", type=int, default=8,
                        help="tiles per device batch; multiples of 8 keep sublane "
                             "alignment (tpuseg extension)")
    parser.add_argument("--radius", dest="radius", type=int, default=None,
                        help="halo radius override; default measures the ERF "
                             "(tpuseg extension)")
    parser.add_argument("--dtype", dest="dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="on-device compute dtype (tpuseg extension)")
    parser.add_argument("--base_features", dest="base_features", type=int, default=64,
                        help="first-level feature depth the checkpoint was built "
                             "with (tpuseg extension; import_checkpoint prints it "
                             "for non-64 reference models)")
    parser.add_argument("--no_data_parallel", dest="data_parallel", action="store_false",
                        help="disable sharding the tile grid over local devices "
                             "(tpuseg extension; sharding is on by default)")
    parser.add_argument("--no_read_ahead", dest="read_ahead", action="store_false",
                        help="read images synchronously instead of prefetching the "
                             "next one (halves peak host memory; tpuseg extension)")
    parser.add_argument("--auto_tile", dest="auto_tile", action="store_true",
                        help="choose the tile size per image to minimize computed "
                             "pixels (halo ring + grid padding) instead of the "
                             "fixed --tile_size; output-exactness neutral "
                             "(tpuseg extension)")
    parser.add_argument("--streaming", dest="streaming", action="store_true",
                        help="stream tiled-BigTIFF inputs window-by-window and "
                             "write masks incrementally — segments whole-slide "
                             "images larger than host RAM (tpuseg extension)")
    parser.add_argument("--quantize", dest="quantize", type=str, default="none",
                        choices=["none", "int8", "int8_blocked", "int8_auto"],
                        help="int8: post-training-quantized serving path — conv "
                             "matmuls run int8 on the MXU after activation-range "
                             "calibration on the first --calibration_images "
                             "inputs; int8_blocked additionally space-to-depth-"
                             "blocks the C=64 edge stages; int8_auto picks per "
                             "dispatch path from the measured serving matrix "
                             "(blocked for tiled images, dense for small "
                             "batches — identical masks) (tpuseg extension)")
    parser.add_argument("--calibration_images", dest="calibration_images",
                        type=int, default=4,
                        help="inputs used for int8 activation-range calibration "
                             "(a deterministic evenly-spaced sample of the "
                             "sorted folder)")
    parser.add_argument("--calibration_in", dest="calibration_in",
                        type=str, default=None,
                        help="load persisted int8 calibration scales (JSON "
                             "written by --calibration_out) and skip the "
                             "calibration passes entirely (tpuseg extension)")
    parser.add_argument("--calibration_out", dest="calibration_out",
                        type=str, default=None,
                        help="write the calibrated int8 activation scales as "
                             "JSON for reuse via --calibration_in and for "
                             "scale-drift audits (tpuseg extension)")
    parser.add_argument("--calibration_percentile", dest="calibration_percentile",
                        type=float, default=99.9,
                        help="|activation| percentile for the int8 clip range "
                             "(100 = exact max; 99.9 is the measured-parity "
                             "default)")
    parser.add_argument("--seed", dest="seed", type=int, default=None,
                        help="seed the ERF probe's noise image so the measured "
                             "halo radius — and with it tile geometry and "
                             "--auto_tile choices — is reproducible across runs "
                             "and identical on every host of a --multihost "
                             "fleet; default draws fresh entropy like the "
                             "reference (tpuseg extension)")
    parser.add_argument("--multihost", dest="multihost", type=int, default=0,
                        help="initialize jax.distributed and stripe the image "
                             "folder across hosts — each host segments its "
                             "share with its local chips; run once per host "
                             "[0 = single host, 1 = multi-host] "
                             "(tpuseg extension)")
    args = parser.parse_args(argv)

    if args.multihost:
        # must run before first jax device use so host identity is known
        from tpuseg.parallel.distributed import initialize_distributed

        initialize_distributed()

    inference(InferenceConfig(
        checkpoint_filepath=args.checkpoint_filepath,
        image_folder=args.image_folder,
        output_folder=args.output_folder,
        number_classes=args.number_classes,
        number_channels=args.number_channels,
        image_format=args.image_format,
        tile_size=args.tile_size,
        batch_size=args.batch_size,
        radius=args.radius,
        dtype=args.dtype,
        base_features=args.base_features,
        data_parallel=args.data_parallel,
        streaming=args.streaming,
        read_ahead=args.read_ahead,
        auto_tile=args.auto_tile,
        quantize=args.quantize,
        calibration_images=args.calibration_images,
        calibration_percentile=args.calibration_percentile,
        calibration_in=args.calibration_in,
        calibration_out=args.calibration_out,
        seed=args.seed,
    ))


if __name__ == "__main__":
    main()
