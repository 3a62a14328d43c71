#!/bin/bash
# Batch runner: train + evaluate the full model matrix.
# Counterpart of the reference run.sh (9 RTFS-Net + 3 TDFNet configs).

set -e

train_and_evaluate() {
    conf=$1
    test_dir=$2
    echo "=== training $conf ==="
    python train.py --conf-dir "rtfs_tpu/configs/${conf}.yaml"
    exp_dir=$(python -c "
from rtfs_tpu.config import load_config
import os
c = load_config('${conf}')
print(os.path.join(c['log'].get('path', 'log/tmp'), c['log']['exp_name']))")
    echo "=== evaluating $conf ==="
    python test.py --conf-dir "${exp_dir}/conf.yaml" --test-dir "$test_dir"
}

for depth in 4 6 12; do
    train_and_evaluate "lrs2_RTFSNet_${depth}_layer" data/LRS2/tt
    train_and_evaluate "lrs3_RTFSNet_${depth}_layer" data/LRS3/tt
    train_and_evaluate "voxceleb2_RTFSNet_${depth}_layer" data/VOX2/tt
done

train_and_evaluate lrs2_TDFNet_4_1 data/LRS2/tt
train_and_evaluate lrs2_TDFNet_16_3 data/LRS2/tt
train_and_evaluate lrs2_TDFNet_16_3_mhsa_shared data/LRS2/tt
