#!/usr/bin/env python3
"""Serve EVE gaze inference over HTTP (TPU-native addition).

Shim onto :mod:`eve_tpu.cli.serve` (also installed as ``eve-serve``):

    python serve.py [config.json ...] --resume-from <run_dir> [--serve-port N]
"""

from eve_tpu.cli.serve import main

if __name__ == '__main__':
    main()
