"""GSheet logger and TensorBoard-fallback behaviors."""

import json
import os

import numpy as np

from eve_tpu.config import DefaultConfig
from eve_tpu.train.gsheet import GoogleSheetLogger
from eve_tpu.train.logging_utils import Tensorboard


class FakeSheet:
    """Minimal gspread-worksheet stand-in."""

    def __init__(self):
        self.rows = [['Identifier']]

    def row_values(self, i):
        return list(self.rows[i - 1])

    def col_values(self, c):
        out = []
        for row in self.rows:
            out.append(row[c - 1] if c - 1 < len(row) else '')
        return out

    def update(self, rng, values):
        idx = int(rng.split(':')[0]) - 1
        while len(self.rows) <= idx:
            self.rows.append([])
        self.rows[idx] = list(values[0])


def _logger_with_fake_sheet(identifier):
    DefaultConfig._reset_instance_for_testing()
    config = DefaultConfig()
    logger = GoogleSheetLogger(config, identifier)
    logger.ready = True
    logger._sheet = FakeSheet()
    return logger


def test_gsheet_update_or_append_row():
    logger = _logger_with_fake_sheet('run/abc')
    sheet = logger._sheet

    logger.update_or_append_row({'test/loss': 1.5})
    header = sheet.rows[0]
    assert 'Identifier' in header and 'test/loss' in header
    assert 'hostname' in header and 'batch_size' in header  # config dump
    # Reference row metadata (gsheet_logger.py:62-84): Last Updated always;
    # datasrc_* / gsheet_* config keys excluded.
    assert 'Last Updated' in header
    assert not any(k.startswith('datasrc_') or k.startswith('gsheet_')
                   for k in header)
    row1 = sheet.rows[1]
    assert row1[header.index('Identifier')] == 'run/abc'
    assert row1[header.index('test/loss')] == 1.5

    # Same identifier: update in place (no new row).
    logger.update_or_append_row({'test/loss': 0.5, 'Step': 10})
    assert len(sheet.rows) == 2
    header = sheet.rows[0]
    assert sheet.rows[1][header.index('test/loss')] == 0.5
    assert sheet.rows[1][header.index('Step')] == 10.0

    # Different identifier: appended.
    logger2 = _logger_with_fake_sheet('run/def')
    logger2._sheet = sheet
    logger2.update_or_append_row({'test/loss': 9.0})
    assert len(sheet.rows) == 3
    DefaultConfig._reset_instance_for_testing()


def test_gsheet_row_metadata(monkeypatch):
    """Reference row metadata (gsheet_logger.py:49-84): LSF job id from the
    environment; 'Start Time' written on fresh-run registration only."""
    monkeypatch.setenv('LSB_JOBID', '424242')
    logger = _logger_with_fake_sheet('run/abc')
    row = logger.fill_in_basic_info()
    assert row['LSF Job ID'] == '424242'
    assert 'Last Updated' in row and 'hostname' in row

    logger._register(resuming=False)
    header = logger._sheet.rows[0]
    assert 'Start Time' in header
    started = logger._sheet.rows[1][header.index('Start Time')]
    assert started  # fresh run: timestamp recorded

    logger2 = _logger_with_fake_sheet('run/resumed')
    logger2._register(resuming=True)
    assert 'Start Time' not in logger2._sheet.rows[0]
    DefaultConfig._reset_instance_for_testing()


def test_gsheet_never_raises():
    logger = _logger_with_fake_sheet('run/abc')
    logger._sheet = None  # any write now explodes internally
    logger.update_or_append_row({'x': 1.0})  # swallowed, never raises


def test_tensorboard_jsonl_fallback(tmp_path, monkeypatch):
    import eve_tpu.train.logging_utils as lu
    Tensorboard._reset_for_testing()
    monkeypatch.setattr(lu, 'SummaryWriter', None)
    tb = Tensorboard(str(tmp_path))
    tb.update_current_step(3)
    tb.add_scalar('train/loss', 1.25)
    tb.close()
    lines = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), 'scalars.jsonl'))]
    assert lines[-1]['tag'] == 'train/loss'
    assert lines[-1]['value'] == 1.25
    assert lines[-1]['step'] == 3
    Tensorboard._reset_for_testing()
