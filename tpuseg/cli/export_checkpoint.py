"""CLI: convert a tpuseg checkpoint to a reference TensorFlow checkpoint.

The inverse of ``tpuseg.cli.import_checkpoint``: a tpuseg-trained model is
written as the reference's ``tf.train.Checkpoint(optimizer, model)``
(train.py:96), ready for the reference's ``inference.py`` to restore
(model.py:81-83). tpuseg extension — makes migration a two-way street.
"""

import argparse


def main(argv=None):
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    parser = argparse.ArgumentParser(
        prog="export_tf_checkpoint",
        description="Convert a tpuseg orbax checkpoint into a reference "
                    "tf.train.Checkpoint (UNet/train.py:96)")
    parser.add_argument("--checkpoint_filepath", dest="checkpoint_filepath", type=str,
                        required=True,
                        help="tpuseg checkpoint directory (Required)")
    parser.add_argument("--output_prefix", dest="output_prefix", type=str, required=True,
                        help="TF checkpoint prefix to write, e.g. "
                             ".../checkpoint/ckpt (Required)")
    parser.add_argument("--number_classes", dest="number_classes", type=int, required=True)
    parser.add_argument("--number_channels", dest="number_channels", type=int, required=True)
    parser.add_argument("--base_features", dest="base_features", type=int, default=64,
                        help="first-level feature depth of the checkpointed model")
    parser.add_argument("--learning_rate", dest="learning_rate", type=float, default=3e-4,
                        help="learning rate recorded in the emitted Adam optimizer")
    args = parser.parse_args(argv)

    from tpuseg.utils.tf_export import export_reference_checkpoint

    prefix = export_reference_checkpoint(
        args.checkpoint_filepath, args.output_prefix,
        args.number_classes, args.number_channels,
        args.base_features, args.learning_rate)
    print(f"Reference TF checkpoint written to {prefix}")
    print("Use it as the reference's --checkpoint_filepath for inference.")


if __name__ == "__main__":
    main()
