#!/bin/bash
# Reference parity: script/test.sh — eval the SOD recipe.
python train.py configs/sod.yml -o work_dir=./output/val -m val "$@"
