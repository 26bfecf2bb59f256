"""M2FNet fusion evaluation — entry point parity with the reference's
``python src/test.py`` (reference src/test.py:14-51): mandatory checkpoint
load, test-split metrics printed as batch-averaged Accuracy / Weighted_F1.
This is the benchmark path of BASELINE.json.
"""

import os
import sys

from pipeline import build, parse_args

from mer_tpu.train import load_checkpoint_auto
from mer_tpu.train.checkpoint import restore_into


def _test_scanned(solver, batcher, params, int8: bool, serving_batch: int | None) -> dict:
    """Production serving path: scanned whole-split inference (one XLA
    dispatch per bucket group), bf16 or the int8 engine. Same batch-averaged
    metric semantics as Solver.test (reference src/test.py:46-47).

    ``serving_batch``: re-collate the split into serving batches of up to
    this many dialogues (serving/offline.py::recollate_batches) — identity
    re-batching; metrics are computed per ORIGINAL batch so batch-averaged
    numbers match the reference loop exactly."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mer_tpu.objectives.metrics import BatchAveragedMetrics
    from mer_tpu.serving import (
        M2FNetInt8, ScanPredictor, quantize_m2fnet, recollate_batches,
        split_recollated,
    )

    if int8:
        p = jax.device_put(quantize_m2fnet(params))
        server = M2FNetInt8(solver.model)

        def predict(p, b):
            return jnp.argmax(server.apply(p, b["text"], b["audio"], b["padding_mask"]), -1)
    else:
        p = jax.device_put(params)

        def predict(p, b):
            return jnp.argmax(
                solver.model.apply(
                    {"params": p}, b["text"], b["audio"], b["padding_mask"], deterministic=True
                ), -1)

    host_batches = list(batcher)
    feed = [{k: b[k] for k in ("text", "audio", "padding_mask")} for b in host_batches]
    if serving_batch is not None:
        merged, plan = recollate_batches(feed, serving_batch)
        preds = split_recollated(ScanPredictor(predict)(p, merged), plan)
    else:
        preds = ScanPredictor(predict)(p, feed)
    metrics = BatchAveragedMetrics()
    for b, pr in zip(host_batches, preds):
        emotion = np.asarray(b["emotion"])
        metrics.update(emotion, pr, mask=emotion != -1)
    compute_dtype = jnp.dtype(solver.model.dtype).name  # config tpu.compute_dtype
    mode = ("int8" if int8 else compute_dtype.replace("bfloat16", "bf16").replace(
        "float32", "f32")) + " scanned" + (
        f", serving_batch={serving_batch}" if serving_batch else ""
    )
    print(
        f"Accuracy=[{metrics.batch_averaged_accuracy * 100:.3f}%] "
        f"Weighted_F1=[{metrics.batch_averaged_weighted_f1 * 100:.3f}%] ({mode})"
    )
    return metrics.summary()


def main(argv=None):
    raw = list(argv if argv is not None else sys.argv[1:])
    int8 = "--int8" in raw
    serving_batch = None
    for i, a in enumerate(raw):
        if a == "--serving-batch":
            if i + 1 >= len(raw):
                raise SystemExit("--serving-batch requires a value (e.g. --serving-batch 512)")
            serving_batch = int(raw[i + 1])
            del raw[i : i + 2]
            break
        if a.startswith("--serving-batch="):
            serving_batch = int(a.split("=", 1)[1])
            del raw[i]
            break
    argv = [a for a in raw if a != "--int8"]
    args = parse_args(argv)
    config, datasets, batchers, solver = build(args, ("test",))

    ckpt_path = os.path.abspath(str(config.checkpoint.load_path))
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found at {ckpt_path} — train first (src/train.py)")

    example = next(iter(batchers["test"]))
    state = solver.init_state(example, steps_per_epoch=1)
    restored = load_checkpoint_auto(ckpt_path)
    params = restore_into(state.params, restored["params"])

    if int8 or serving_batch is not None:
        return _test_scanned(solver, batchers["test"], params, int8, serving_batch)
    result = solver.test(batchers["test"], params)
    return result


if __name__ == "__main__":
    main()
