"""Plot-layer smoke: CSVs from the loggers render to PNG without error."""

import subprocess
import sys

import numpy as np


def test_plot_logs_simple_and_flagship(tmp_path):
    simple = tmp_path / "mppi.csv"
    t = np.arange(0, 2, 0.1)
    np.savetxt(simple, np.column_stack([t, np.sin(t), t * 0, t * 0.1, np.cos(t), t * 0]), delimiter=",")
    flagship = tmp_path / "flag.csv"
    cols = [t] + [np.sin(t + i) for i in range(19)]
    np.savetxt(flagship, np.column_stack(cols), delimiter=",")
    for csv in (simple, flagship):
        out = subprocess.run(
            [sys.executable, "scripts/plot_logs.py", str(csv), "--out", str(tmp_path)],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert "saved:" in out.stdout
    assert len(list(tmp_path.glob("*.png"))) == 2
