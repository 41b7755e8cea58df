#!/bin/bash
# Model-family comparison grid at the canonical point-seg config.
# Counterpart of reference bash_scripts/train_point_nets_seg.sh +
# run_PointTransformer_experiments.sh.
set -e

DATA_DIR=${DATA_DIR:-data}
OUT=${OUT:-results}
EXTRA=${EXTRA:-}

for model in DGCNN PointNet PointTransformer; do
  for kp in foerstner cnn; do
    cmd="python train_point_seg.py --data fissures --ds data --data_dir $DATA_DIR \
        --pts 2048 --k 40 --static --coords --batch 32 --model $model \
        --kp_mode $kp --output $OUT/${model}_seg_${kp} $EXTRA"
    echo "### $cmd"
    $cmd
  done
done
