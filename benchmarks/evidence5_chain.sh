#!/bin/bash
# Round-3 discriminating evidence, 5%-labeled row: the reference's OTHER
# headline semi-supervised protocol (SemiMambaUNet.pdf Table 1, labeled_num 3
# of 140 patients = 5%; cmd /root/reference/README.md:90-93) on the same hard
# phantoms as evidence3 (60 cases x 12 slices -> 5% = 36 labeled slices).
# Complements runs/evidence3_* (the 10% row, Table 2 protocol). Every leg
# passes --resume, so rerunning this script continues from the latest
# periodic checkpoint.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
SPEC="60 12 6 12 224"
ROOT=/tmp/synthetic_acdc_60x12v6t12s224h
RUNS=/root/repo/runs

# 1. semi: cross-teaching ViM <-> ViM, 5% labeled
python -m mamba_unet_tpu.cli.train \
  --model ViM_seg --method cross_teaching \
  --synthetic --synthetic_hard --synthetic_spec $SPEC \
  --patch_size 224 224 --batch_size 16 --labeled_bs 8 --labeled_slices 36 \
  --max_iterations 30000 --eval_every 200 --num_classes 4 --seed 1337 \
  --optimizer adamw --base_lr 1e-3 --drop_path 0.0 --bf16 \
  --consistency 0.1 --consistency_rampup 200.0 \
  --snapshot_dir $RUNS/evidence5_semi --resume \
  >> $RUNS/evidence5_semi.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path $ROOT --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint $RUNS/evidence5_semi \
  > $RUNS/evidence5_semi_test.log 2>&1

# 2. supervised baseline: SAME 36 labeled slices only, same protocol length
python -m mamba_unet_tpu.cli.train \
  --model ViM_seg --method fully_supervised \
  --synthetic --synthetic_hard --synthetic_spec $SPEC \
  --patch_size 224 224 --batch_size 16 --labeled_slices 36 \
  --max_iterations 30000 --eval_every 200 --num_classes 4 --seed 1337 \
  --optimizer adamw --base_lr 1e-3 --drop_path 0.0 --bf16 \
  --snapshot_dir $RUNS/evidence5_sup --resume \
  >> $RUNS/evidence5_sup.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path $ROOT --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint $RUNS/evidence5_sup \
  > $RUNS/evidence5_sup_test.log 2>&1

echo DONE > $RUNS/evidence5_chain.done
