"""Unit tests for the perf-regression gate's band logic (bench.py --check).

The measurements themselves need the real TPU; the pass/fail semantics —
directionality (faster is never a regression), band math, missing-band
handling, --record round-trip — are pure logic and must not wait for a
regression on real hardware to prove they fire.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture
def fake_gate(monkeypatch, tmp_path):
    """Point bench.run_check at a temp bands file + stubbed measurements."""
    bands_path = tmp_path / 'bands.json'
    measured = {}

    def install(checks, bands=None, tol=0.06, per_metric_tol=None):
        monkeypatch.setattr(bench, 'CHECKS', {
            name: (lambda v=value: v, unit, higher)
            for name, (value, unit, higher) in checks.items()})
        # os.path.join treats an absolute BANDS_FILE as final, so the
        # repo-relative resolution inside run_check lands on our temp file.
        monkeypatch.setattr(bench, 'BANDS_FILE', str(bands_path))
        if bands is not None:
            payload = {'rel_tol': tol, 'recorded': bands}
            if per_metric_tol:
                payload['per_metric_tol'] = per_metric_tol
            bands_path.write_text(json.dumps(payload))
        return bands_path

    measured['install'] = install
    return measured


def test_in_band_passes(fake_gate, capsys):
    fake_gate['install']({'m': (100.0, 'frames/s', True)},
                         bands={'m': 101.0})
    assert bench.run_check() == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line == {'metric': 'bench_check', 'value': 1, 'unit': 'pass',
                    'vs_baseline': 0}


def test_slower_throughput_fails(fake_gate, capsys):
    fake_gate['install']({'m': (90.0, 'frames/s', True)},
                         bands={'m': 100.0})  # -10% > 6% tol
    assert bench.run_check() == 1
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line['value'] == 0


def test_faster_throughput_never_fails(fake_gate):
    fake_gate['install']({'m': (200.0, 'frames/s', True)},
                         bands={'m': 100.0})  # 2x faster: fine
    assert bench.run_check() == 0


def test_latency_direction_is_inverted(fake_gate):
    # Lower-is-better metric: a SLOWER (higher) value must fail...
    fake_gate['install']({'ms': (120.0, 'ms', False)}, bands={'ms': 100.0})
    assert bench.run_check() == 1
    # ...and a faster (lower) one must pass.
    fake_gate['install']({'ms': (80.0, 'ms', False)}, bands={'ms': 100.0})
    assert bench.run_check() == 0


def test_missing_band_fails_loudly(fake_gate):
    """A metric added to CHECKS without re-recording bands must fail the
    gate (silently skipping it would un-gate new headline metrics)."""
    fake_gate['install']({'m': (100.0, 'frames/s', True),
                          'new_metric': (5.0, 'ms', False)},
                         bands={'m': 100.0})
    assert bench.run_check() == 1


def test_per_metric_tolerance_override(fake_gate):
    """A metric listed in per_metric_tol uses its own band width (ADVICE
    r4: the dispatched train metric's 8.5% compile-to-compile spread is
    wider than the 6% default band — noise must not fail the gate)."""
    # 8% slower than recorded: fails at the 6% default...
    fake_gate['install']({'train_ms': (108.0, 'ms', False)},
                         bands={'train_ms': 100.0})
    assert bench.run_check() == 1
    # ...passes with a 10% per-metric override...
    fake_gate['install']({'train_ms': (108.0, 'ms', False)},
                         bands={'train_ms': 100.0},
                         per_metric_tol={'train_ms': 0.10})
    assert bench.run_check() == 0
    # ...and other metrics keep the default width.
    fake_gate['install']({'train_ms': (108.0, 'ms', False),
                          'other_ms': (108.0, 'ms', False)},
                         bands={'train_ms': 100.0, 'other_ms': 100.0},
                         per_metric_tol={'train_ms': 0.10})
    assert bench.run_check() == 1


def test_record_roundtrips_through_check(fake_gate):
    path = fake_gate['install']({'m': (123.45, 'frames/s', True)})
    assert bench.run_check(record=True) == 0
    recorded = json.loads(path.read_text())
    assert recorded['recorded'] == {'m': 123.45}
    assert bench.run_check() == 0  # immediately in-band vs itself


def test_pending_record_metric_does_not_fail_gate(fake_gate):
    """A metric explicitly listed as pending_record (added to CHECKS but
    not yet recordable on real hardware) is measured and reported without
    failing the gate; an UNLISTED missing band still fails."""
    path = fake_gate['install']({'m': (100.0, 'frames/s', True),
                                 'new_metric': (5.0, 'ms', False)},
                                bands={'m': 100.0})
    payload = json.loads(path.read_text())
    payload['pending_record'] = ['new_metric']
    path.write_text(json.dumps(payload))
    assert bench.run_check() == 0


def test_committed_bands_cover_all_checked_metrics():
    """bench_bands.json must have a band (or an explicit dated
    pending_record entry) for every CHECKS metric — a metric silently
    absent from both would un-gate a headline number."""
    with open(os.path.join(REPO, 'bench_bands.json')) as f:
        bands = json.load(f)
    covered = set(bands['recorded']) | set(bands.get('pending_record', []))
    assert set(bench.CHECKS) <= covered
    assert set(bands['recorded']) <= set(bench.CHECKS)
