#!/bin/bash
# Contrastive-consistency evidence chain (VERDICT r4 task 8): a bounded
# hard-phantom run of the Semi_Contrastive_Consistency method — CTAugment
# policy learning + projector/EMA-projector contrastive losses — with the
# round-5 checkpointing exercised for real: the run is split into two legs
# (kill after leg 1, --resume restores models, projectors, EMA teachers AND
# the learned CTA policy from cta_state.json), then BOTH saved best models
# are evaluated through cli/test.py. Mirrors benchmarks/evidence5_chain.sh.
#
# Reference protocol: train_Semi_Contrastive_Consistency.py (bs16/8; the
# reference's richest save/restore contract, :633-690 + util.py:54-94).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
SPEC="60 12 6 12 224"
ROOT=/tmp/synthetic_acdc_60x12v6t12s224h
RUNS=/root/repo/runs
ITERS1=${ITERS1:-3000}
ITERS2=${ITERS2:-6000}

train_leg () {  # $1 = max_iterations for this leg
  python -m mamba_unet_tpu.cli.train \
    --model unet --method contrastive_consistency \
    --synthetic --synthetic_hard --synthetic_spec $SPEC \
    --patch_size 224 224 --batch_size 16 --labeled_bs 8 --labeled_slices 72 \
    --max_iterations "$1" --eval_every 200 --num_classes 4 --seed 1337 \
    --base_lr 0.01 \
    --consistency 0.1 --consistency_rampup 200.0 \
    --snapshot_dir $RUNS/evidence_cc --resume \
    >> $RUNS/evidence_cc.log 2>&1
}

# leg 1: train to ITERS1, checkpointing best/best2 + periodic + cta sidecar
train_leg $ITERS1
# leg 2: SAME command with a longer horizon — exercises the resume path
# (models + projectors + EMA + CTA policy rates restored, iteration
# continues from the periodic checkpoint, marks from best_marks.json)
train_leg $ITERS2

# evaluate BOTH saved best models (model1 = best, model2/EMA-branch = best2)
for m in "best" "best2"; do
  python -m mamba_unet_tpu.cli.test \
    --root_path $ROOT --model unet --num_classes 4 \
    --patch_size 224 224 --split test \
    --checkpoint $RUNS/evidence_cc --ckpt_name $m \
    > $RUNS/evidence_cc_test_$m.log 2>&1
done

echo DONE > $RUNS/evidence_cc_chain.done
