#!/bin/bash
# Seed-duplicated runs (reference scripts/dup_run_sbatch.sh without Slurm):
# copies the params file REPEAT times as -dupN.py and runs them sequentially
# with distinct seeds; test.py's --train_shots sweep averages over the dups.
#
#   REPEAT=3 ./scripts/dup_run.sh "python train.py" configs/.../joint_fsclip_ncaltech_params.py --num_shots 5
REPEAT=${REPEAT:-3}
CMD=$1
PARAMS=$2
PY_ARGS=${@:3}

cmd="$CMD --params $PARAMS $PY_ARGS"
echo $cmd
eval $cmd
for repeat_idx in $(seq 1 $((REPEAT-1)))
do
    params="${PARAMS:0:(-3)}-dup${repeat_idx}.py"
    cp "$PARAMS" "$params"
    cmd="$CMD --params $params --seed $repeat_idx $PY_ARGS"
    echo $cmd
    eval $cmd
done
