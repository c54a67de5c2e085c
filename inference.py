#!/usr/bin/env python3
"""Run EVE inference on one video and render the PoG overlay video.

Shim onto :mod:`eve_tpu.cli.inference` (also installed as
``eve-inference``); kept so the reference's invocation works from a
source checkout:

    python inference.py --input-path .../webcam_c.mp4 --output-path out.mp4
"""

from eve_tpu.cli.inference import main

if __name__ == '__main__':
    main()
