"""CLI: score predicted masks against ground truth (mIoU / Dice / accuracy).

tpuseg extension — the reference has no quality-evaluation tool; BASELINE.md's
parity bar (mIoU on the bundled corpus) is measured with this.
"""

import argparse
import json

from tpuseg.ops.metrics import evaluate_folder


def main(argv=None):
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    parser = argparse.ArgumentParser(
        prog="evaluate",
        description="Score a folder of predicted masks against ground-truth masks "
                    "(matching filenames).")
    parser.add_argument("--pred_folder", dest="pred_folder", type=str, required=True,
                        help="folder of predicted masks (e.g. inference output)")
    parser.add_argument("--truth_folder", dest="truth_folder", type=str, required=True,
                        help="folder of ground-truth masks")
    parser.add_argument("--number_classes", dest="number_classes", type=int, required=True)
    args = parser.parse_args(argv)

    result = evaluate_folder(args.pred_folder, args.truth_folder, args.number_classes)
    print(json.dumps(result, indent=2))
    # console scripts do sys.exit(main()): returning the (truthy) dict made
    # every successful evaluation exit with status 1 (review r3)
    return 0


if __name__ == "__main__":
    main()
