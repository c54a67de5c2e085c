#!/usr/bin/env python3
"""Export a trained run as a self-contained AOT ``.eve`` serving artifact.

Shim onto :mod:`eve_tpu.cli.export_model` (also installed as
``eve-export``):

    python export_model.py --resume-from <run_dir> --output-path model.eve
"""

from eve_tpu.cli.export_model import main

if __name__ == '__main__':
    main()
