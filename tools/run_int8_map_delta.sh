#!/bin/bash
# int8 attention serving mode: mAP delta on a TRAINED model.
#
# Random-weight detection agreement (tools/bench_int8.py) exercises the kernel
# but not realistic activation statistics; this script trains the full-scale
# fusion model on the 48-image synthetic fixture (the plateau-validation
# recipe, mAP ~0.99 by epoch 60 — PARITY.md) and evaluates the SAME checkpoint
# with attention_quant off / int8_qk / int8, reporting the three mAP numbers.
#
# Usage: bash tools/run_int8_map_delta.sh [root=/tmp/int8delta] [epochs=40]
set -e
ROOT=${1:-/tmp/int8delta}
EPOCHS=${2:-40}
cd /root/repo
if [ ! -f "$ROOT/labels_test.csv" ]; then
  python - "$ROOT" <<'EOF'
import sys
from frn_tpu.config import DSEC
from frn_tpu.data.synthetic import make_csv_fixture
print(make_csv_fixture(sys.argv[1], geometry=DSEC, num_images=48))
EOF
fi
if [ ! -d "$ROOT/ckpt" ]; then
  python -m frn_tpu.cli.train --dataset_name dsec \
    --csv_train "$ROOT/labels_test.csv" --csv_test "$ROOT/labels_test.csv" \
    --csv_classes "$ROOT/labels_map.csv" \
    --root_img "$ROOT/images" --root_event "$ROOT/events" \
    --fusion fpn_fusion --depth 50 --compute_dtype bfloat16 \
    --epochs "$EPOCHS" --warmup_steps 60 --eval_every 1000 \
    --checkpoint_every "$EPOCHS" --checkpoint_dir "$ROOT/ckpt"
fi
for Q in "" "int8_qk" "int8"; do
  echo "=== attention_quant=${Q:-none} ==="
  python -m frn_tpu.cli.test --dataset_name dsec \
    --csv_test "$ROOT/labels_test.csv" --csv_classes "$ROOT/labels_map.csv" \
    --root_img "$ROOT/images" --root_event "$ROOT/events" \
    --fusion fpn_fusion --depth 50 --compute_dtype bfloat16 \
    --checkpoint "$ROOT/ckpt" --batch_size 8 --approx_topk \
    --save_detect_folder "$ROOT/eval_${Q:-none}" \
    ${Q:+--attention_quant "$Q"}
done
