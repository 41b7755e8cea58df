#!/bin/bash
# DGCNN-seg experiment grid: keypoint mode x point feature.
# Counterpart of reference bash_scripts/run_dgcnn_seg_experiments.sh /
# redo_dgcnn_seg.sh (canonical config: 2048 pts, k=40, static graph,
# batch 32 — .run/DGCNN seg train [master].run.xml:52).
#
# One point-file folder holds ONE keypoint/feature combination (recorded in
# the npz meta; training warns on mismatch), so each experiment first
# preprocesses into its own $PREP_ROOT/${kp}_${feat} folder from the shared
# $RAW_DIR of {case}_raw.npz inputs, then trains on it. Preprocessing is
# skipped when the folder already has point files. On TPU there is no --gpu
# scatter; runs go sequentially on the chip (add EXTRA=--dp for a
# data-parallel mesh when more chips are attached).
set -e

RAW_DIR=${RAW_DIR:-data_raw}          # {case}_raw.npz inputs
PREP_ROOT=${PREP_ROOT:-data}          # per-combination point-file folders
OUT=${OUT:-results}
EXTRA=${EXTRA:-}
CNN_MODEL=${CNN_MODEL:-}              # trained seg-CNN .fst for kp_mode=cnn

run () {
  kp=$1
  feat=$2
  if [[ "$feat" == "none" ]]; then
    name="DGCNN_seg_${kp}_nofeat"
    featflag=""
  else
    name="DGCNN_seg_${kp}_${feat}"
    featflag="--patch $feat"
  fi
  prep="$PREP_ROOT/${kp}_${feat}"
  if ! ls "$prep"/*_points_*.npz >/dev/null 2>&1; then
    prepflags="--data_dir $RAW_DIR --output $prep --kp_mode $kp"
    [[ "$feat" != "none" ]] && prepflags="$prepflags --feature $feat"
    [[ -n "$CNN_MODEL" ]] && prepflags="$prepflags --cnn_model $CNN_MODEL"
    echo "### python preprocess_dataset.py $prepflags"
    python preprocess_dataset.py $prepflags
  fi
  cmd="python train_point_seg.py --data fissures --ds data --data_dir $prep \
      --pts 2048 --k 40 --static --coords --batch 32 \
      --kp_mode $kp $featflag --output $OUT/$name $EXTRA"
  echo "### $cmd"
  $cmd
}

run foerstner none
run foerstner image
run foerstner mind
run foerstner mind_ssc
run enhancement none
run enhancement enhancement
run cnn none
run cnn image
run cnn mind_ssc
run noisy none
