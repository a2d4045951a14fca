#!/bin/bash
# Follow-up chain after the 10k-iter ViM evidence run: test-split report,
# then shorter UNet and Swin-UNet runs under the same Trainer (VERDICT r1 #3).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=/tmp/synthetic_acdc_140x9v20t40s256

# wait for the ViM run to finish
while kill -0 "$(cat /tmp/evidence.pid)" 2>/dev/null; do sleep 30; done

python -m mamba_unet_tpu.cli.test \
  --root_path "$ROOT" --model ViM_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint /root/repo/runs/evidence_vim \
  > /root/repo/runs/evidence_vim_test.log 2>&1

python -m mamba_unet_tpu.cli.train \
  --model unet --method fully_supervised --synthetic \
  --synthetic_spec 140 9 20 40 256 \
  --patch_size 256 256 --batch_size 24 --max_iterations 2000 \
  --base_lr 0.01 --eval_every 200 --num_classes 4 --seed 1337 \
  --snapshot_dir /root/repo/runs/evidence_unet \
  > /root/repo/runs/evidence_unet.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path "$ROOT" --model unet --num_classes 4 \
  --patch_size 256 256 --split test \
  --checkpoint /root/repo/runs/evidence_unet \
  > /root/repo/runs/evidence_unet_test.log 2>&1

python -m mamba_unet_tpu.cli.train \
  --model ViT_seg --method fully_supervised --synthetic \
  --synthetic_spec 140 9 20 40 256 \
  --patch_size 224 224 --batch_size 24 --max_iterations 2000 \
  --base_lr 0.01 --bf16 --eval_every 200 --num_classes 4 --seed 1337 \
  --snapshot_dir /root/repo/runs/evidence_swin \
  > /root/repo/runs/evidence_swin.log 2>&1

python -m mamba_unet_tpu.cli.test \
  --root_path "$ROOT" --model ViT_seg --num_classes 4 \
  --patch_size 224 224 --split test \
  --checkpoint /root/repo/runs/evidence_swin \
  > /root/repo/runs/evidence_swin_test.log 2>&1

echo DONE > /root/repo/runs/evidence_chain.done
