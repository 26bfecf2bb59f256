"""M2FNet fusion evaluation — entry point parity with the reference's
``python src/test.py`` (reference src/test.py:14-51): mandatory checkpoint
load, test-split metrics printed as batch-averaged Accuracy / Weighted_F1.
This is the benchmark path of BASELINE.json.
"""

import os

from pipeline import build, parse_args

from mer_tpu.train import load_checkpoint
from mer_tpu.train.checkpoint import restore_into


def main(argv=None):
    args = parse_args(argv)
    config, datasets, batchers, solver = build(args, ("test",))

    ckpt_path = os.path.abspath(str(config.checkpoint.load_path))
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found at {ckpt_path} — train first (src/train.py)")

    example = next(iter(batchers["test"]))
    state = solver.init_state(example, steps_per_epoch=1)
    restored = load_checkpoint(ckpt_path)
    params = restore_into(state.params, restored["params"])

    result = solver.test(batchers["test"], params)
    return result


if __name__ == "__main__":
    main()
