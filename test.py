#!/usr/bin/env python
"""Eval entry point (reference script/test.sh parity): train.py -m val."""

import sys

from train import main

if __name__ == "__main__":
    sys.argv.extend(["-m", "val"])
    main()
