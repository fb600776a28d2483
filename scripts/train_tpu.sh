#!/bin/bash
# Resilient training launcher (the TPU equivalent of the reference's SLURM
# requeue workflow, calodiffusion/slurm/diffu_train.sh: trap + resubmit up to
# max_restarts).  Works under any scheduler that re-runs the script on
# preemption (GKE/TPU-VM maintenance events, SLURM --requeue, etc.):
# checkpoints are written every epoch and --load resumes exactly.
#
# Usage: CONFIG=configs/config_dataset2.json DATA=/data CKPT=/ckpt \
#        MAX_RESTARTS=10 ./scripts/train_tpu.sh

set -u
CONFIG=${CONFIG:?set CONFIG=path/to/config.json}
DATA=${DATA:-./data}
CKPT=${CKPT:-./trained_models}
MAX_RESTARTS=${MAX_RESTARTS:-10}

restart_count=0
extra_flags=""

# resume if a checkpoint already exists (preemption recovery)
name=$(python - "$CONFIG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["CHECKPOINT_NAME"])
EOF
)
if [ -e "$CKPT/${name}_Diffusion/checkpoint.ckpt" ]; then
    extra_flags="--load"
fi

while [ "$restart_count" -le "$MAX_RESTARTS" ]; do
    python -m calodiffusion_tpu.training \
        -c "$CONFIG" -d "$DATA" --checkpoint "$CKPT" $extra_flags diffusion
    code=$?
    if [ $code -eq 0 ]; then
        echo "training finished"
        exit 0
    fi
    restart_count=$((restart_count + 1))
    extra_flags="--load"
    echo "training exited with $code; restart $restart_count/$MAX_RESTARTS"
done
exit 1
