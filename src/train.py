"""M2FNet fusion training — entry point parity with the reference's
``python src/train.py`` (reference src/train.py:15-109): load config, build
dialogue datasets from the exported embedding artifacts, train with CE
(ignore_index=-1, label_smoothing=0.1), per-epoch validation, checkpointing,
early stopping.  The loop itself lives in mer_tpu.train.Solver as one jitted
XLA program per batch shape.
"""

from pipeline import build, parse_args


def main(argv=None):
    args = parse_args(argv)
    config, datasets, batchers, solver = build(args, ("train", "val"))

    print("Training...")
    state, history = solver.fit(batchers["train"], batchers["val"])
    print("Training complete")
    return state, history


if __name__ == "__main__":
    main()
