#!/bin/bash
# Weak-Mamba-UNet discriminating evidence: the paper's method (scribble pCE +
# random-simplex composite pseudo-label Dice, UNet + Swin-UNet + Mamba-UNet)
# vs its own pCE-only ablation baseline, on the HARD 224^2 phantoms with
# synthesized scribbles (data/scribble.py), dense labels kept for val/test
# metrics. Each leg passes --resume (kill-and-resume safe); each trio member
# is tested through cli/test.py (--ckpt_name best|best2|best3).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ITERS=${ITERS:-8000}
SPEC="60 12 6 12 224"
ROOT=/tmp/synthetic_acdc_60x12v6t12s224hw
RUNS=/root/repo/runs

train () {  # $1 snapshot dir, extra args after
  local snap=$1; shift
  python -m mamba_unet_tpu.cli.train \
    --method weak_scribble --model unet \
    --synthetic --synthetic_hard --synthetic_spec $SPEC \
    --patch_size 224 224 --batch_size 24 \
    --max_iterations $ITERS --eval_every 400 --num_classes 4 --seed 1337 \
    --optimizer adamw --base_lr 1e-3 --drop_path 0.0 --bf16 \
    --snapshot_dir $snap --resume "$@" \
    >> $snap.log 2>&1
}

test_member () {  # $1 snapshot dir, $2 ckpt name, $3 model
  python -m mamba_unet_tpu.cli.test \
    --root_path $ROOT --model $3 --num_classes 4 \
    --patch_size 224 224 --split test \
    --checkpoint $1 --ckpt_name $2 \
    > $1_test_$2.log 2>&1
}

# 1. full method
train $RUNS/evidence_weak
for m in "best unet" "best2 ViT_seg" "best3 ViM_seg"; do
  set -- $m; test_member $RUNS/evidence_weak $1 $2
done

# 2. pCE-only ablation
train $RUNS/evidence_weak_pce --weak_pce_only
for m in "best unet" "best2 ViT_seg" "best3 ViM_seg"; do
  set -- $m; test_member $RUNS/evidence_weak_pce $1 $2
done

echo DONE > $RUNS/evidence_weak_chain.done
