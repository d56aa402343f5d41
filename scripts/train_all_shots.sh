#!/bin/bash
# Run `train.py` with different numbers of shots (reference
# scripts/train_all_shots.sh). Example:
#   ./scripts/train_all_shots.sh "python train.py --params configs/fsclip/joint_adapter/joint_fsclip_ncaltech_params.py"
CMD=$1

shot1=${2:-20}
shot2=${3:-10}
shot3=${4:-5}
shot4=${5:-3}
shot5=${6:-1}

for shot in $shot1 $shot2 $shot3 $shot4 $shot5
do
    cmd="$CMD --num_shots $shot"
    echo $cmd
    eval $cmd
done
