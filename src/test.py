"""M2FNet fusion evaluation — entry point parity with the reference's
``python src/test.py`` (reference src/test.py:14-51): mandatory checkpoint
load, test-split metrics printed as batch-averaged Accuracy / Weighted_F1.
This is the benchmark path of BASELINE.json.
"""

import os
import sys

from pipeline import build, parse_args

from mer_tpu.train import load_checkpoint
from mer_tpu.train.checkpoint import restore_into


def _test_int8_scanned(solver, batcher, params) -> dict:
    """Production serving path: int8 engine + scanned whole-split inference
    (one XLA dispatch per bucket group). Same batch-averaged metric
    semantics as Solver.test (reference src/test.py:46-47)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mer_tpu.objectives.metrics import BatchAveragedMetrics
    from mer_tpu.serving import M2FNetInt8, ScanPredictor, quantize_m2fnet

    qparams = jax.device_put(quantize_m2fnet(params))
    server = M2FNetInt8(solver.model)

    def predict(p, b):
        return jnp.argmax(server.apply(p, b["text"], b["audio"], b["padding_mask"]), -1)

    host_batches = list(batcher)
    preds = ScanPredictor(predict)(
        qparams, [{k: b[k] for k in ("text", "audio", "padding_mask")} for b in host_batches]
    )
    metrics = BatchAveragedMetrics()
    for b, p in zip(host_batches, preds):
        emotion = np.asarray(b["emotion"])
        metrics.update(emotion, p, mask=emotion != -1)
    print(
        f"Accuracy=[{metrics.batch_averaged_accuracy * 100:.3f}%] "
        f"Weighted_F1=[{metrics.batch_averaged_weighted_f1 * 100:.3f}%] (int8 scanned)"
    )
    return metrics.summary()


def main(argv=None):
    int8 = "--int8" in (argv if argv is not None else sys.argv[1:])
    if int8:
        argv = [a for a in (argv if argv is not None else sys.argv[1:]) if a != "--int8"]
    args = parse_args(argv)
    config, datasets, batchers, solver = build(args, ("test",))

    ckpt_path = os.path.abspath(str(config.checkpoint.load_path))
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found at {ckpt_path} — train first (src/train.py)")

    example = next(iter(batchers["test"]))
    state = solver.init_state(example, steps_per_epoch=1)
    restored = load_checkpoint(ckpt_path)
    params = restore_into(state.params, restored["params"])

    if int8:
        return _test_int8_scanned(solver, batchers["test"], params)
    result = solver.test(batchers["test"], params)
    return result


if __name__ == "__main__":
    main()
