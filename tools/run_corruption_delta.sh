#!/bin/bash
# Procedural-corruption mAP delta bound (VERDICT r4 task #4).
#
# Trains the fusion model on a 48-image synthetic fixture at 96x128 depth-18
# (the CPU-friendly plateau-validation recipe: mAP ~0.9 by epoch 40), then
# runs tools/corruption_delta.py: on-the-fly vs --corruption_root folder tree
# vs formula/reseed variant tree. Record the JSON line in PARITY "Known gaps".
#
# Usage: bash tools/run_corruption_delta.sh [root=/tmp/corrdelta] [epochs=40]
set -e
ROOT=${1:-/tmp/corrdelta}
EPOCHS=${2:-40}
cd /root/repo
export JAX_PLATFORMS=cpu
if [ ! -f "$ROOT/labels_test.csv" ]; then
  PYTHONPATH= python - "$ROOT" <<'EOF'
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
import dataclasses
from frn_tpu.config import DSEC
from frn_tpu.data.synthetic import make_csv_fixture
geo = dataclasses.replace(DSEC, height=96, width=128)
print(make_csv_fixture(sys.argv[1], geometry=geo, num_images=48))
EOF
fi
if [ ! -d "$ROOT/ckpt" ]; then
  PYTHONPATH= python -m frn_tpu.cli.train --dataset_name dsec \
    --csv_train "$ROOT/labels_test.csv" --csv_test "$ROOT/labels_test.csv" \
    --csv_classes "$ROOT/labels_map.csv" \
    --root_img "$ROOT/images" --root_event "$ROOT/events" \
    --fusion fpn_fusion --depth 18 --image_height 96 --image_width 128 \
    --epochs "$EPOCHS" --warmup_steps 60 --eval_every 1000 \
    --checkpoint_every "$EPOCHS" --checkpoint_dir "$ROOT/ckpt"
fi
PYTHONPATH= python tools/corruption_delta.py --root "$ROOT" \
  --checkpoint "$ROOT/ckpt" --severities "${3:-1,3,5}"
