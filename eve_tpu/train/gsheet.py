"""Google Sheets experiment registry logger.

Mirrors the reference ``GoogleSheetLogger``
(src/core/gsheet_logger.py:39-206): one row per run identifier, columns
auto-extended from config keys + hostname + metrics, update-or-append
semantics, and — critically — *every* failure swallowed so experiment
tracking can never kill a run. ``gspread`` is optional; without it (or
without secrets) the logger is inert (``ready == False``).
"""

import logging
import socket
import traceback

logger = logging.getLogger(__name__)


class GoogleSheetLogger:

    def __init__(self, config, identifier):
        self.config = config
        self.identifier = identifier
        self.ready = False
        self._sheet = None
        try:
            if not config.gsheet_secrets_json_file or \
                    not config.gsheet_workbook_key:
                return
            import gspread  # noqa: F401
            from oauth2client.service_account import ServiceAccountCredentials
            scope = ['https://spreadsheets.google.com/feeds',
                     'https://www.googleapis.com/auth/drive']
            creds = ServiceAccountCredentials.from_json_keyfile_name(
                config.gsheet_secrets_json_file, scope)
            client = gspread.authorize(creds)
            self._workbook = client.open_by_key(config.gsheet_workbook_key)
            self._sheet = self._workbook.sheet1
            self.ready = True
        except Exception:
            logger.warning('GoogleSheetLogger disabled:\n%s',
                           traceback.format_exc())
            self.ready = False

    def fill_in_basic_info(self):
        row = {'Identifier': self.identifier,
               'Hostname': socket.getfqdn()}
        try:
            row.update({k: str(v)
                        for k, v in self.config.get_all_key_values().items()})
        except Exception:
            pass
        return row

    def update_or_append_row(self, values):
        """Write metrics; never raises (reference gsheet_logger.py:54-59)."""
        if not self.ready:
            return
        try:
            row = self.fill_in_basic_info()
            row.update({k: (float(v) if hasattr(v, '__float__') else str(v))
                        for k, v in values.items()})
            header = self._sheet.row_values(1)
            new_cols = [k for k in row if k not in header]
            if new_cols:
                header = header + new_cols
                self._sheet.update('1:1', [header])
            ids = self._sheet.col_values(header.index('Identifier') + 1)
            try:
                row_idx = ids.index(self.identifier) + 1
            except ValueError:
                row_idx = len(ids) + 1
            out = [row.get(col, '') for col in header]
            self._sheet.update('%d:%d' % (row_idx, row_idx), [out])
        except Exception:
            logger.warning('GoogleSheetLogger write failed:\n%s',
                           traceback.format_exc())
