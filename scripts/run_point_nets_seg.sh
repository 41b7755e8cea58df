#!/bin/bash
# Model-family comparison grid at the canonical point-seg config.
# Counterpart of reference bash_scripts/train_point_nets_seg.sh +
# run_PointTransformer_experiments.sh. Point files are preprocessed once
# per keypoint mode into $PREP_ROOT/${kp}_none (see
# run_dgcnn_seg_experiments.sh for the folder convention).
set -e

RAW_DIR=${RAW_DIR:-data_raw}
PREP_ROOT=${PREP_ROOT:-data}
OUT=${OUT:-results}
EXTRA=${EXTRA:-}
CNN_MODEL=${CNN_MODEL:-}

for kp in foerstner cnn; do
  prep="$PREP_ROOT/${kp}_none"
  if ! ls "$prep"/*_points_*.npz >/dev/null 2>&1; then
    prepflags="--data_dir $RAW_DIR --output $prep --kp_mode $kp"
    [[ -n "$CNN_MODEL" ]] && prepflags="$prepflags --cnn_model $CNN_MODEL"
    echo "### python preprocess_dataset.py $prepflags"
    python preprocess_dataset.py $prepflags
  fi
  for model in DGCNN PointNet PointTransformer; do
    cmd="python train_point_seg.py --data fissures --ds data --data_dir $prep \
        --pts 2048 --k 40 --static --coords --batch 32 --model $model \
        --kp_mode $kp --output $OUT/${model}_seg_${kp} $EXTRA"
    echo "### $cmd"
    $cmd
  done
done
