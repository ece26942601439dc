"""CLI: convert a reference TensorFlow checkpoint to a tpuseg checkpoint.

The reference trains with TF and saves ``tf.train.Checkpoint(optimizer,
model)`` (train.py:96, 181-184); this tool lets those trained models be
served by ``tpuseg.cli.inference`` (or resumed via ``--resume_checkpoint``)
without TensorFlow at inference time. tpuseg extension — the reference has
no converter tooling.
"""

import argparse


def main(argv=None):
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    parser = argparse.ArgumentParser(
        prog="import_tf_checkpoint",
        description="Convert a reference tf.train.Checkpoint (UNet/model.py:81-83) "
                    "into a tpuseg orbax checkpoint")
    parser.add_argument("--tf_checkpoint", dest="tf_checkpoint", type=str, required=True,
                        help="TF checkpoint prefix (e.g. .../checkpoint/ckpt) or the "
                             "directory containing it (Required)")
    parser.add_argument("--output_folder", dest="output_folder", type=str, required=True,
                        help="directory to write the tpuseg checkpoint into (Required)")
    parser.add_argument("--learning_rate", dest="learning_rate", type=float, default=3e-4,
                        help="learning rate recorded in the emitted train state "
                             "(only relevant if training is resumed from it)")
    args = parser.parse_args(argv)

    from tpuseg.utils.tf_import import import_reference_checkpoint

    geometry = import_reference_checkpoint(
        args.tf_checkpoint, args.output_folder, args.learning_rate)
    print(f"Imported reference checkpoint: {geometry}")
    print(f"tpuseg checkpoint written to {args.output_folder}")
    bf = geometry.get("base_features", 64)
    bf_flag = f"--base_features {bf} " if bf != 64 else ""
    print("Serve it with: python -m tpuseg.cli.inference "
          f"--checkpoint_filepath {args.output_folder} "
          f"--number_classes {geometry['number_classes']} "
          f"--number_channels {geometry['number_channels']} {bf_flag}...")


if __name__ == "__main__":
    main()
