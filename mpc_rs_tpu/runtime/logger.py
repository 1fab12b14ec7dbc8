"""CSV logging with reference-compatible column schemas.

The reference flushes a CSV row per step (examples/mppi4.rs:56-65) with
schemas documented in scripts/plot-*.py; our schemas match so the plot
scripts work unchanged (SURVEY §5 observability):

- simple loop   : t, u, x[0..n]                  (mppi4.rs:56-65)
- flagship loop : t, u, x[0..6], x_est[0..6], x_pred[0..6]
                  (mppi4-non-liner-ukf.rs:401-434, plot-mpc-ukf.py:36-54)
- mpc-ukf-x     : t, u, act[0..4], est[0..4], pred[0..4], ref[0..4]
- hw log        : t, u, x_est[0..6], p_diag[0..6] (mppi4-ukf-commu.rs:353-396)

Timestamped filenames mirror mppi4-ukf-commu.rs:354-359.
"""

from __future__ import annotations

import csv
import datetime
import os
from typing import Iterable


class CsvLogger:
    def __init__(self, path: str, timestamped: bool = False, flush_per_row: bool = True):
        if timestamped:
            stem, ext = os.path.splitext(path)
            stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
            path = f"{stem}-{stamp}{ext or '.csv'}"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._fh = open(path, "w", newline="")
        self._writer = csv.writer(self._fh)
        self._flush = flush_per_row

    def write_row(self, *values: Iterable):
        flat = []
        for v in values:
            if hasattr(v, "__iter__") and not isinstance(v, str):
                flat.extend(float(c) for c in v)
            else:
                flat.append(float(v))
        self._writer.writerow([repr(v) for v in flat])
        if self._flush:
            self._fh.flush()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
