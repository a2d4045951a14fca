#!/bin/bash
# Continuation of evidence3_chain.sh (the round-3 discriminating evidence,
# VERDICT r2 task 4): every leg passes --resume, so the whole chain is
# kill-and-resume safe — rerunning this script picks each run up from its
# latest periodic checkpoint (the original chain died with its session at
# iter 6450/30000).
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
  --snapshot_dir $RUNS/evidence3_semi --resume \
  >> $RUNS/evidence3_semi.log 2>&1

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
  --snapshot_dir $RUNS/evidence3_sup10 --resume \
  >> $RUNS/evidence3_sup10.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path $ROOT --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint $RUNS/evidence3_sup10 \
  > $RUNS/evidence3_sup10_test.log 2>&1

echo DONE > $RUNS/evidence3_chain.done
