#!/usr/bin/env bash
# On-chip evidence recapture queue (round-4 VERDICT #1/#2/#3/#5/#6).
# Run the moment the axon TPU service is healthy:
#   nohup bash scripts/recapture_evidence.sh > /tmp/recapture.log 2>&1 &
# Each leg logs to /tmp/evidence_<leg>.log; the script is resumable (skips
# legs whose log already ends in DONE).
set -u
cd "$(dirname "$0")/.."

run_leg() {
  local name="$1"; shift
  local log="/tmp/evidence_${name}.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^DONE$"; then
    echo "[skip] $name (already DONE)"
    return 0
  fi
  echo "[run ] $name: $*"
  if "$@" > "$log" 2>&1; then
    echo "DONE" >> "$log"
    echo "[ok  ] $name"
  else
    echo "FAILED rc=$?" >> "$log"
    echo "[FAIL] $name (see $log)"
  fi
}

# 0. backend probe (fail fast if the service is still down)
run_leg probe timeout 300 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).block_until_ready(); print('TPU OK')"
tail -2 /tmp/evidence_probe.log | grep -q "TPU OK" || { echo "backend still down — aborting"; exit 1; }

# 1. headline bench (driver contract: ONE JSON line)
run_leg bench python bench.py

# 2. wav2vec2 conv frontend decision (adopt GEMM if >=1.1x)
run_leg w2v_conv python scripts/profile_w2v_conv.py

# 3. fusion train batch sweep to 512
run_leg train_sweep python scripts/profile_fusion_train_batch.py

# 4. full evidence set -> BENCH_LOCAL.json (includes the new train roofline,
#    bigbatch MFU, w2v static-int8 rows, re-measured e2e legs)
run_leg bench_all python bench_all.py /tmp/meldbig

# 5. verify-skill TPU legs
run_leg synth python scripts/make_synthetic_meld.py /tmp/meldsyn --dialogues 16
run_leg fusion_train python src/train.py --synthetic --epochs 1
run_leg fusion_test python src/test.py --synthetic --int8 --serving-batch 512
run_leg fe_text python src/feature_extractors/text/train.py --data-root /tmp/meldsyn --epochs 2 --random-init --toy-tokenizer
run_leg fe_w2v python src/feature_extractors/audio_wav2vec2/train.py --data-root /tmp/meldsyn --epochs 1 --random-init
run_leg e2e python src/e2e_stream.py --data-root /tmp/meldsyn --toy-tokenizer
run_leg e2e_mel python src/e2e_stream.py --data-root /tmp/meldsyn --toy-tokenizer --audio mel
run_leg serve python src/serve.py --synthetic --requests 128
run_leg graft python __graft_entry__.py

echo "all legs attempted — check /tmp/evidence_*.log"
