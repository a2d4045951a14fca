#!/bin/bash
# The real-data drop-in gate: given the raw ACDC nii.gz tree, run
# preprocess -> train -> test for the three headline configs with the
# reference protocol unchanged, and print test Dice next to the published
# numbers (BASELINE.md; parity bar = +-0.5 Dice, BASELINE.json).
#
#   ACDC_RAW=/data/ACDC_raw ./scripts/acdc_reproduce.sh [workdir]
#
# Headline configs (reference commands, /root/reference/README.md:75-98):
#   1. Mamba-UNet fully supervised   (ViM_seg, 224^2, bs24, 10k it, SGD .01)
#      -> published Dice 0.9281 (MambaUNet.pdf Table 1)
#   2. Semi-Mamba-UNet 5% labeled    (cross_teaching, labeled_num 3, bs16/8,
#      30k it) -> published Dice 0.8386 (SemiMambaUNet.pdf Table 1)
#   3. Weak-Mamba-UNet scribble      (weak_scribble, 30k it)
#      -> published Dice 0.9171 (WeakMambaUNet.pdf)
#
# Env overrides (used by the dry smoke, tests/test_acdc_runbook.py):
#   ITERS / SEMI_ITERS  training lengths        (default 10000 / 30000)
#   BATCH / LABELED_BS  batch sizes             (default 24 or 16 / 8)
#   PATCH               square patch size       (default 224)
#   EVAL_EVERY          val cadence             (default 200)
#   CONFIGS             subset to run, space-separated from
#                       {supervised semi weak}  (default all three)
set -euo pipefail

RAW=${ACDC_RAW:?set ACDC_RAW to the raw ACDC nii.gz tree}
WORK=${1:-runs/acdc_real}
DATA="$WORK/data_acdc"
ITERS=${ITERS:-10000}
SEMI_ITERS=${SEMI_ITERS:-30000}
BATCH=${BATCH:-24}
SEMI_BATCH=${SEMI_BATCH:-16}
LABELED_BS=${LABELED_BS:-8}
LABELED_NUM=${LABELED_NUM:-3}
PATCH=${PATCH:-224}
EVAL_EVERY=${EVAL_EVERY:-200}
CONFIGS=${CONFIGS:-"supervised semi weak"}
PY=${PYTHON:-python}

mkdir -p "$WORK"

echo "== [1/3] preprocess: $RAW -> $DATA (reference patient split)"
"$PY" -m mamba_unet_tpu.cli.preprocess \
  --raw_dir "$RAW" --out_dir "$DATA" --splits reference

train () {  # name, then cli.train args...
  local name=$1; shift
  echo "== train $name"
  "$PY" -m mamba_unet_tpu.cli.train \
    --root_path "$DATA" --num_classes 4 --seed 1337 \
    --eval_every "$EVAL_EVERY" --snapshot_dir "$WORK/$name" "$@"
  echo "== test $name"
  "$PY" -m mamba_unet_tpu.cli.test \
    --root_path "$DATA" --num_classes 4 --split test \
    --patch_size "$PATCH" "$PATCH" \
    --checkpoint "$WORK/$name" "${TEST_EXTRA[@]:-}" \
    | tee "$WORK/${name}_test.log"
}

for cfg in $CONFIGS; do
  case "$cfg" in
    supervised)
      TEST_EXTRA=(--model ViM_seg)
      train mambaunet_supervised \
        --model ViM_seg --method fully_supervised \
        --patch_size "$PATCH" "$PATCH" --batch_size "$BATCH" \
        --max_iterations "$ITERS" --base_lr 0.01
      ;;
    semi)
      # Semi-Mamba-UNet: ViM<->ViM cross teaching (the published protocol,
      # README.md:90-93); tested checkpoint = model-1 best (the paper's
      # reported branch), as in benchmarks/evidence5_chain.sh
      TEST_EXTRA=(--model ViM_seg)
      train semi_mambaunet_${LABELED_NUM} \
        --model ViM_seg --method cross_teaching \
        --patch_size "$PATCH" "$PATCH" --batch_size "$SEMI_BATCH" \
        --labeled_bs "$LABELED_BS" --labeled_num "$LABELED_NUM" \
        --max_iterations "$SEMI_ITERS" --base_lr 0.01
      ;;
    weak)
      # Weak-Mamba-UNet: UNet + Swin + Mamba trio on scribbles; the paper
      # reports the Mamba member (= best3), as in evidence_weak_chain.sh
      TEST_EXTRA=(--model ViM_seg --ckpt_name best3)
      train weak_mambaunet \
        --model unet --method weak_scribble \
        --patch_size "$PATCH" "$PATCH" --batch_size "$BATCH" \
        --max_iterations "$SEMI_ITERS" --base_lr 0.01
      ;;
    *) echo "unknown config '$cfg'"; exit 2 ;;
  esac
done

echo "== published reference numbers (BASELINE.md; parity bar +-0.5 Dice):"
echo "   Mamba-UNet supervised  Dice 0.9281  HD95 2.4645"
echo "   Semi-Mamba-UNet 5%     Dice 0.8386  HD95 6.2139  (10%: 0.9114)"
echo "   Weak-Mamba-UNet        Dice 0.9171  HD95 3.9597"
echo "== test logs: $WORK/*_test.log"
