#!/bin/bash
# DGCNN-seg experiment grid: keypoint mode x point feature.
# Counterpart of reference bash_scripts/run_dgcnn_seg_experiments.sh /
# redo_dgcnn_seg.sh (canonical config: 2048 pts, k=40, static graph,
# batch 32 — .run/DGCNN seg train [master].run.xml:52). On TPU there is no
# --gpu scatter; runs go sequentially on the chip (add --dp for a
# data-parallel mesh when more chips are attached).
set -e

DATA_DIR=${DATA_DIR:-data}
OUT=${OUT:-results}
EXTRA=${EXTRA:-}

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
  cmd="python train_point_seg.py --data fissures --ds data --data_dir $DATA_DIR \
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
