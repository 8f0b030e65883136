#!/bin/bash
# Reference parity: script/train.sh — train the SOD recipe.
python train.py configs/sod.yml -o work_dir=./output/sod_04 "$@"
