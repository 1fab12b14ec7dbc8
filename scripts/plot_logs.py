#!/usr/bin/env python
"""Analysis/visualization layer (L5) — reads the engine's CSV logs and
renders time-series panels plus a cart-pole animation.

Schema-compatible with the reference logs (scripts/plot-mpc-ukf.py:36-54
documents the 20-column flagship layout; simple loops write t,u,x[0..n]).
Outputs: PNG time series always; MP4 animation when ffmpeg is available,
GIF otherwise.

Usage:
  python scripts/plot_logs.py logs/mppi/mppi.csv [--out imgs/] [--animate]
  python scripts/plot_logs.py logs/pid/pid.csv --kind pid
"""

from __future__ import annotations

import argparse
import datetime
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.patches as patches  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib.animation import FuncAnimation, PillowWriter  # noqa: E402

L_PEND = 0.270  # pendulum length for drawing (reference uses 0.270)
R_WHEEL = 0.05


def detect_kind(ncols: int, kind: str | None) -> str:
    if kind:
        return kind
    if ncols >= 20:
        return "flagship"  # t,u,x6,est6,pred6
    if ncols >= 18:
        return "mpc-ukf-x"  # t,u,act4,est4,pred4,ref4
    if ncols == 7:
        return "pid"  # t,u,ref,x4
    return "simple"  # t,u,x...


def plot_timeseries(data, kind, out_png):
    t, u = data[:, 0], data[:, 1]
    fig, axes = plt.subplots(2, 1, figsize=(10, 7), sharex=True)
    ax = axes[0]
    ax.plot(t, u, "-.r", label="u")
    if kind == "flagship":
        ax.plot(t, data[:, 2], "b", label="x")
        ax.plot(t, data[:, 3], "g", label="x'")
        ax2 = ax.twinx()
        ax2.plot(t, data[:, 5], color="gold", ls="-.", label="θ")
        ax2.plot(t, data[:, 6], color="darkorange", ls="-.", label="θ'")
        axes[1].plot(t, data[:, 8], "b", label="x_est")
        axes[1].plot(t, data[:, 11], color="gold", label="θ_est")
        axes[1].plot(t, data[:, 17], color="red", ls=":", label="θ_pred")
    elif kind == "mpc-ukf-x":
        ax.plot(t, data[:, 2], "b", label="x")
        ax.plot(t, data[:, 4], color="gold", label="θ")
        axes[1].plot(t, data[:, 6], "b", label="x_est")
        axes[1].plot(t, data[:, 8], color="gold", label="θ_est")
        axes[1].plot(t, data[:, 14], "b:", label="x_ref")
        axes[1].plot(t, data[:, 16], color="gold", ls=":", label="θ_ref")
    elif kind == "pid":
        ax.plot(t, data[:, 2], "k:", label="θ_ref")
        ax.plot(t, data[:, 3], "b", label="x")
        ax.plot(t, data[:, 5], color="gold", label="θ")
        axes[1].plot(t, data[:, 4], "g", label="x'")
        axes[1].plot(t, data[:, 6], color="darkorange", label="θ'")
    else:
        labels = ["x", "x'", "θ", "θ'", "θ''"]
        for i in range(2, min(data.shape[1], 7)):
            ax.plot(t, data[:, i], label=labels[i - 2] if i - 2 < len(labels) else f"x{i-2}")
        axes[1].plot(t, u, "r", label="u")
    for a in axes:
        a.legend(loc="upper right", fontsize=8)
        a.grid(alpha=0.3)
    axes[1].set_xlabel("time [s]")
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    print(f"saved: {out_png}")


def animate_cartpole(data, kind, out_path):
    t = data[:, 0]
    if kind == "flagship":
        xs, ths = data[:, 2], data[:, 5]
        est = (data[:, 8], data[:, 11])
        pred = (data[:, 14], data[:, 17])
    elif kind == "mpc-ukf-x":
        xs, ths = data[:, 2], data[:, 4]
        est = (data[:, 6], data[:, 8])
        pred = (data[:, 10], data[:, 12])
    else:
        xs = data[:, 2]
        ths = data[:, 4] if data.shape[1] > 4 else np.zeros_like(xs)
        est = pred = None

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.set_xlim(min(xs.min(), -1) - 0.5, max(xs.max(), 1) + 0.5)
    ax.set_ylim(-R_WHEEL, 0.5)
    ax.set_aspect("equal")
    wheel = patches.Circle((0, 0), R_WHEEL, fc="none", ec="k")
    (rod,) = ax.plot([], [], "k-", lw=3, label="act")
    (rod_e,) = ax.plot([], [], "b:", lw=2, label="est")
    (rod_p,) = ax.plot([], [], "r:", lw=2, label="pred")
    ax.add_patch(wheel)
    ax.legend(loc="upper right")
    title = ax.set_title("")

    def update(i):
        x, th = xs[i], ths[i]
        wheel.center = (x, 0)
        rod.set_data([x, x + L_PEND * np.sin(th)], [0, L_PEND * np.cos(th)])
        if est is not None:
            xe, te = est[0][i], est[1][i]
            rod_e.set_data([xe, xe + L_PEND * np.sin(te)], [0, L_PEND * np.cos(te)])
            xp, tp = pred[0][i], pred[1][i]
            rod_p.set_data([xp, xp + L_PEND * np.sin(tp)], [0, L_PEND * np.cos(tp)])
        title.set_text(f"step={i:4d}  t={t[i]:.3f}s")
        return rod, rod_e, rod_p

    dt_ms = max(1.0, (t[1] - t[0]) * 1000 if len(t) > 1 else 30)
    ani = FuncAnimation(fig, update, frames=len(t), interval=dt_ms, repeat=False)
    try:
        ani.save(out_path, writer="ffmpeg")
    except Exception:
        out_path = os.path.splitext(out_path)[0] + ".gif"
        ani.save(out_path, writer=PillowWriter(fps=max(1, int(1000 / dt_ms))))
    plt.close(fig)
    print(f"saved: {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--out", default="imgs")
    ap.add_argument("--kind", choices=["simple", "flagship", "mpc-ukf-x", "pid"], default=None)
    ap.add_argument("--animate", action="store_true")
    args = ap.parse_args()

    data = np.loadtxt(args.csv, delimiter=",", dtype=float)
    if data.ndim == 1:
        data = data[None, :]
    kind = detect_kind(data.shape[1], args.kind)
    os.makedirs(args.out, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
    stem = os.path.splitext(os.path.basename(args.csv))[0]
    plot_timeseries(data, kind, os.path.join(args.out, f"{stem}_{stamp}.png"))
    if args.animate:
        animate_cartpole(data, kind, os.path.join(args.out, f"anim_{stem}_{stamp}.mp4"))


if __name__ == "__main__":
    main()
