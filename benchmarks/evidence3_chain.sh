#!/bin/bash
# Round-3 discriminating evidence chain (VERDICT r2 task 4): the reference
# semi protocol (30k iterations, bs16 with labeled_bs 8, 224^2,
# train_Semi_Mamba_UNet.py / README.md:95-98) on HARD phantoms (wobbly
# boundaries, distractors, bias field, apical no-RV slices), 10% labeled
# (72 of 720 train slices), plus the labeled-only supervised baseline at
# the SAME label budget and iteration count, plus cli/test.py test passes.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
SPEC="60 12 6 12 224"
ROOT=/tmp/synthetic_acdc_60x12v6t12s224h
RUNS=/root/repo/runs

# 1. semi: cross-teaching ViM <-> ViM (reference pairing), 10% labeled
python -m mamba_unet_tpu.cli.train \
  --model ViM_seg --method cross_teaching \
  --synthetic --synthetic_hard --synthetic_spec $SPEC \
  --patch_size 224 224 --batch_size 16 --labeled_bs 8 --labeled_slices 72 \
  --max_iterations 30000 --eval_every 200 --num_classes 4 --seed 1337 \
  --optimizer adamw --base_lr 1e-3 --drop_path 0.0 --bf16 \
  --consistency 0.1 --consistency_rampup 200.0 \
  --snapshot_dir $RUNS/evidence3_semi \
  > $RUNS/evidence3_semi.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path $ROOT --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint $RUNS/evidence3_semi \
  > $RUNS/evidence3_semi_test.log 2>&1

# 2. supervised baseline: SAME 72 labeled slices only, same protocol length
python -m mamba_unet_tpu.cli.train \
  --model ViM_seg --method fully_supervised \
  --synthetic --synthetic_hard --synthetic_spec $SPEC \
  --patch_size 224 224 --batch_size 16 --labeled_slices 72 \
  --max_iterations 30000 --eval_every 200 --num_classes 4 --seed 1337 \
  --optimizer adamw --base_lr 1e-3 --drop_path 0.0 --bf16 \
  --snapshot_dir $RUNS/evidence3_sup10 \
  > $RUNS/evidence3_sup10.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path $ROOT --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint $RUNS/evidence3_sup10 \
  > $RUNS/evidence3_sup10_test.log 2>&1

echo DONE > $RUNS/evidence3_chain.done
