#!/bin/bash
# Sweep launcher — the authors' fully-supervised model sweep
# (/root/reference/code/supervised_run.sh: unet/vnet 10k, swinunet 20k,
# mambaunet 14k iterations, bs18, seed 5179) re-expressed on the single
# training CLI. Pass the ACDC root as $1 (defaults to the reference layout);
# add --synthetic --synthetic_spec 140 9 20 40 256 for the phantom dataset.
# LABELED=7 reproduces the authors' 7-patient variant
# (/root/reference/code/supervised_run7.sh).
set -e
ROOT=${1:-../data/ACDC}
shift || true
EXTRA="$@"
LAB=${LABELED:-140}

python -m mamba_unet_tpu.cli.train --root_path "$ROOT" --labeled_num $LAB \
  --exp ACDC/unet --model unet --max_iterations 10000 --batch_size 18 \
  --seed 5179 --snapshot_dir runs/sweep_unet $EXTRA
python -m mamba_unet_tpu.cli.train --root_path "$ROOT" --labeled_num $LAB \
  --exp ACDC/vnet --model vnet --max_iterations 10000 --batch_size 18 \
  --seed 5179 --snapshot_dir runs/sweep_vnet $EXTRA
python -m mamba_unet_tpu.cli.train --root_path "$ROOT" --labeled_num $LAB \
  --exp ACDC/swinunet --model ViT_seg --patch_size 224 224 \
  --max_iterations 20000 --batch_size 18 --seed 5179 \
  --snapshot_dir runs/sweep_swin $EXTRA
python -m mamba_unet_tpu.cli.train --root_path "$ROOT" --labeled_num $LAB \
  --exp ACDC/VIM --model ViM_seg --patch_size 224 224 \
  --max_iterations 14000 --batch_size 18 --seed 5179 \
  --snapshot_dir runs/sweep_vim $EXTRA
