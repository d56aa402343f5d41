#!/bin/bash
# Run `test.py` over the 9 N-ImageNet robustness variants plus the normal
# val set (reference scripts/test_all_subset.sh).
CMD=$1

for subset in -1 1 2 3 4 5 6 7 8 9
do
    cmd="$CMD --subset $subset"
    echo $cmd
    eval $cmd
done
