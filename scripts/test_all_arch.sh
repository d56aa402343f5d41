#!/bin/bash
# Run `test.py` with every supported CLIP arch (reference
# scripts/test_all_arch.sh; ResNet towers pending - see README roadmap).
CMD=$1

for arch in 'ViT-B/32' 'ViT-B/16' 'ViT-L/14'
do
    echo "Testing $arch"
    cmd="$CMD --arch $arch --bs 64"
    echo $cmd
    eval $cmd
done
