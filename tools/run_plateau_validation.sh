#!/bin/bash
# Plateau-scheduler validation at realistic settings (VERDICT r2 #6).
#
# The 6-image round-2/3 runs proved the *warning*: reference patience 3 on
# 3-step noisy epochs decays lr to oblivion (CLAUDE.md training notes;
# /tmp/plateau_run_6img.log: lr 1e-4 -> 1e-16 by epoch 50, loss stuck ~3.7).
# This run is the positive case: 48 images -> 24 accumulation-2 steps/epoch,
# --warmup_steps 60 (first ~2.5 epochs), reference patience 3 — the scheduler
# must NOT collapse the lr while the loss is still improving.
#
# Usage: bash tools/run_plateau_validation.sh [root=/tmp/plateau48]
set -e
ROOT=${1:-/tmp/plateau48}
cd /root/repo
if [ ! -f "$ROOT/labels_test.csv" ]; then
  python - "$ROOT" <<'EOF'
import sys
from frn_tpu.config import DSEC
from frn_tpu.data.synthetic import make_csv_fixture
print(make_csv_fixture(sys.argv[1], geometry=DSEC, num_images=48))
EOF
fi
rm -rf "$ROOT/ckpt"
exec python -m frn_tpu.cli.train --dataset_name dsec \
  --csv_train "$ROOT/labels_test.csv" --csv_test "$ROOT/labels_test.csv" \
  --csv_classes "$ROOT/labels_map.csv" \
  --root_img "$ROOT/images" --root_event "$ROOT/events" \
  --fusion fpn_fusion --depth 50 --compute_dtype bfloat16 \
  --epochs 60 --warmup_steps 60 --eval_every 10 \
  --checkpoint_every 1000 --checkpoint_dir "$ROOT/ckpt"
