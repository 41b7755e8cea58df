#!/bin/bash
# COPD transfer validation of trained DGCNN-seg models.
# Counterpart of reference bash_scripts/run_dgcnn_seg_COPD_validation.sh:
# re-tests existing result folders with the validation set swapped to the
# COPD cases (train.py copd branches / data.py:486-498); writes *_copd CSVs.
set -e

DATA_DIR=${DATA_DIR:-data}
OUT=${OUT:-results}

for name in DGCNN_seg_foerstner_nofeat DGCNN_seg_enhancement_enhancement \
            DGCNN_seg_cnn_image; do
  if [[ -d "$OUT/$name" ]]; then
    cmd="python train_point_seg.py --output $OUT/$name --test_only --copd \
        --data_dir $DATA_DIR"
    echo "### $cmd"
    $cmd
  else
    echo "### skipping $name (not trained)"
  fi
done
