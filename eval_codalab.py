#!/usr/bin/env python3
"""Produce a Codalab leaderboard submission from a trained run.

Shim onto :mod:`eve_tpu.cli.eval_codalab` (also installed as
``eve-eval-codalab``); kept so the reference's invocation works from a
source checkout:

    python eval_codalab.py --resume-from <output_dir>
"""

from eve_tpu.cli.eval_codalab import *  # noqa: F401,F403
from eve_tpu.cli.eval_codalab import (  # noqa: F401
    KEYS_TO_STORE, init_dataset, main, script_init_common)

if __name__ == '__main__':
    main()
