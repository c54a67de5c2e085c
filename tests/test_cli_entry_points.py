"""The CLI surface stays invocable three ways: repo-root shims
(``python train.py`` — the reference's invocation), package modules
(``python -m eve_tpu.cli.train`` — what the installed ``eve-train``
console script binds to, pyproject.toml), and direct import of ``main``.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('module', ['eve_tpu.cli.train',
                                    'eve_tpu.cli.export_model'])
def test_module_help_exits_zero(module):
    out = subprocess.run(
        [sys.executable, '-m', module, '--help'], cwd=REPO,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'usage:' in out.stdout
    # The auto-generated config flags are present (reference parity).
    assert '--refine-net-enabled' in out.stdout


def test_root_shim_help_exits_zero():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'train.py'), '--help'], cwd=REPO,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert '--max-sequence-len' in out.stdout


def test_all_shims_export_main():
    sys.path.insert(0, REPO)
    try:
        for name in ('train', 'inference', 'eval_codalab', 'serve',
                     'export_model'):
            shim = __import__(name)
            pkg = __import__('eve_tpu.cli.%s' % name, fromlist=['main'])
            assert shim.main is pkg.main, name
    finally:
        sys.path.remove(REPO)
