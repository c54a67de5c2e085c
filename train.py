#!/usr/bin/env python3
"""Train the EVE gaze-estimation model (TPU-native).

Shim onto :mod:`eve_tpu.cli.train` (also installed as ``eve-train``);
kept so the reference's invocation works from a source checkout:

    python train.py [config1.json config2.json ...] [--flag value ...]
"""

from eve_tpu.cli.train import main

if __name__ == '__main__':
    main()
