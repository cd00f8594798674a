"""Faithful PyTorch-CPU re-creation of the reference's north-star training
loop, used ONLY to anchor the benchmark denominator.

The reference itself cannot run as checked in (`KANFET` is undefined and
torchdiffeq is not installed here — SURVEY.md §0.2), so per BASELINE.md we
time "the runnable PyTorch reference path plus a faithful KANFET shim":
the same math as ``train_kanfet_node_predprey.py`` (KAN [2,10,2] grid 5
with SiLU-base + B-spline + ferroelectric branches, dopri5 rtol 1e-7 /
atol 1e-9, Adam lr 2e-3, backprop through the solver) with an adaptive
Dormand-Prince stepper equivalent to torchdiffeq's.

Usage:  python benchmarks/reference_cpu.py [n_epochs]
Writes benchmarks/baseline_cpu.json with sec/epoch.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)

# ---------------------------------------------------------------- model

class FerroBranch(nn.Module):
    """P = Ps*tanh(k*(E + Ec*branch)) + bias with smooth branch momentum."""

    def __init__(self, d_in, d_out, K, gate_slope=10.0, alpha=0.8):
        super().__init__()
        shape = (d_in, d_out, K)
        self.k = nn.Parameter(torch.rand(shape) * 2 + 0.5)
        self.Ec = nn.Parameter(torch.rand(shape) * 2 + 0.5)
        self.Ps = nn.Parameter(torch.rand(shape) * 1.5 + 0.5)
        self.bias = nn.Parameter(torch.randn(shape) * 0.1)
        self.coef = nn.Parameter(torch.randn(shape) * 0.1)
        self.gate_slope, self.alpha = gate_slope, alpha
        self.register_buffer("prev_x", torch.zeros(1, d_in))
        self.register_buffer("branch", torch.ones(1, *shape[:1], d_out, K))

    def forward(self, x):
        B = x.shape[0]
        xe = x[:, :, None, None]
        prev = self.prev_x.detach()
        if prev.shape[0] != B:
            prev = prev.expand(B, -1).contiguous()
        br = self.branch.detach()
        if br.shape[0] != B:
            br = br.expand(B, -1, -1, -1).contiguous()
        up = torch.sigmoid(self.gate_slope * (xe - prev[:, :, None, None]))
        cp = torch.sigmoid(self.gate_slope * (xe - self.Ec))
        cn = torch.sigmoid(self.gate_slope * (-xe - self.Ec))
        sw_up, sw_dn = up * cp, (1 - up) * cn
        target = sw_up - sw_dn + (1 - sw_up - sw_dn) * br
        mom = self.alpha * br + (1 - self.alpha) * target
        basis = self.Ps * torch.tanh(self.k * (xe + self.Ec * mom)) + self.bias
        self.prev_x = x.detach().mean(0, keepdim=True)
        self.branch = target.detach().mean(0, keepdim=True)
        return torch.einsum("biok,iok->bo", basis, self.coef)


class KANFETLinear(nn.Module):
    def __init__(self, d_in, d_out, grid_size=5, order=3, ferro_K=8):
        super().__init__()
        self.d_in, self.d_out, self.order, self.grid_size = d_in, d_out, order, grid_size
        h = 2.0 / grid_size
        knots = torch.arange(-order, grid_size + order + 1).float() * h - 1.0
        self.register_buffer("grid", knots.expand(d_in, -1).contiguous())
        self.base_weight = nn.Parameter(torch.empty(d_out, d_in))
        nn.init.kaiming_uniform_(self.base_weight, a=math.sqrt(5))
        self.spline_weight = nn.Parameter(torch.randn(d_out, d_in, grid_size + order) * 0.02)
        self.spline_scaler = nn.Parameter(torch.empty(d_out, d_in))
        nn.init.kaiming_uniform_(self.spline_scaler, a=math.sqrt(5))
        self.ferro = FerroBranch(d_in, d_out, ferro_K)

    def b_splines(self, x):
        g = self.grid
        xe = x.unsqueeze(-1)
        b = ((xe >= g[:, :-1]) & (xe < g[:, 1:])).to(x.dtype)
        for k in range(1, self.order + 1):
            b = ((xe - g[:, : -(k + 1)]) / (g[:, k:-1] - g[:, : -(k + 1)]) * b[:, :, :-1]
                 + (g[:, k + 1:] - xe) / (g[:, k + 1:] - g[:, 1:-k]) * b[:, :, 1:])
        return b

    def forward(self, x):
        base = F.linear(F.silu(x), self.base_weight)
        sw = self.spline_weight * self.spline_scaler.unsqueeze(-1)
        spline = F.linear(self.b_splines(x).flatten(1), sw.flatten(1))
        return base + spline + self.ferro(x)


class KANFET(nn.Module):
    def __init__(self, layers, grid_size=5):
        super().__init__()
        self.layers = nn.ModuleList(
            KANFETLinear(i, o, grid_size) for i, o in zip(layers, layers[1:]))

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        return x


# ------------------------------------------------- adaptive dopri5 (torch)

_C = [0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B = _A[-1] + [0.0]
_BL = [5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]


def dopri5(f, y0, ts, rtol=1e-7, atol=1e-9, max_steps=2000):
    t, y = float(ts[0]), y0
    out = [y0]
    ti = 1
    dt = 1e-3
    f0 = f(t, y)
    n_steps = 0
    while ti < len(ts) and n_steps < max_steps:
        n_steps += 1
        t_target = float(ts[-1])
        dt = min(dt, t_target - t)
        ks = [f0]
        for i in range(1, 7):
            yi = y + dt * sum(a * k for a, k in zip(_A[i], ks))
            ks.append(f(t + _C[i] * dt, yi))
        y1 = y + dt * sum(b * k for b, k in zip(_B, ks) if b)
        y1_low = y + dt * sum(b * k for b, k in zip(_BL, ks) if b)
        err = y1 - y1_low
        scale = atol + rtol * torch.maximum(y.abs(), y1.abs())
        en = max(float(torch.sqrt(((err / scale) ** 2).mean()).detach()), 1e-10)
        if en <= 1.0 or dt <= 1e-10:
            # linear output interpolation (endpoints accurate enough at 1e-7)
            while ti < len(ts) and float(ts[ti]) <= t + dt + 1e-12:
                th = (float(ts[ti]) - t) / dt if dt > 0 else 0.0
                out.append(y + th * (y1 - y))
                ti += 1
            t, y, f0 = t + dt, y1, ks[6]
            dt = dt * min(10.0, max(0.2, 0.9 * en ** (-0.2)))
            if t >= t_target - 1e-12:
                break
        else:
            dt = dt * max(0.2, 0.9 * en ** (-0.2))
    while len(out) < len(ts):
        out.append(y)
    return torch.stack(out)


def main():
    """Run the reference training loop on torch-CPU.

    Usage: python reference_cpu.py [n_epochs] [--curve out.jsonl] [--test-every K]

    With --curve, records the convergence curve the reference's own loop
    tracks (train_kanfet_node_predprey.py:252-262): per-epoch train MSE on
    t in [0, 3.5] (35 pts) and, every K epochs, the extrapolation test MSE
    over trajectory points 35..140 of t in [0, 14] vs scipy truth. The
    JSONL is written incrementally so a partial run still yields the curve.
    """
    args = sys.argv[1:]
    n_epochs = int(args[0]) if args and not args[0].startswith("-") else 30
    curve_path = None
    test_every = 10
    if "--curve" in args:
        curve_path = args[args.index("--curve") + 1]
    if "--test-every" in args:
        test_every = int(args[args.index("--test-every") + 1])

    # ground truth via scipy (as the reference does), on the FULL horizon
    from scipy.integrate import odeint as scipy_odeint

    a, b, c, d = 1.5, 1.0, 3.0, 1.0
    tf, tf_learn, n_t, n_train = 14.0, 3.5, 140, 35
    ts_full = np.linspace(0, tf, n_t)
    ts_learn = np.linspace(0, tf_learn, n_train)
    truth_full = scipy_odeint(lambda s, t: [a * s[0] - b * s[0] * s[1],
                                            d * s[0] * s[1] - c * s[1]],
                              [1.0, 1.0], ts_full)
    truth_learn = scipy_odeint(lambda s, t: [a * s[0] - b * s[0] * s[1],
                                             d * s[0] * s[1] - c * s[1]],
                               [1.0, 1.0], ts_learn)
    target = torch.tensor(truth_learn, dtype=torch.float32)
    target_full = torch.tensor(truth_full, dtype=torch.float32)

    model = KANFET([2, 10, 2], grid_size=5)
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    X0 = torch.tensor([[1.0, 1.0]])
    tts = torch.tensor(ts_learn, dtype=torch.float32)
    tts_full = torch.tensor(ts_full, dtype=torch.float32)

    def rhs(t, X):
        return model(X)

    def test_mse():
        with torch.no_grad():
            pred_full = dopri5(rhs, X0, tts_full, max_steps=8000)
        return float(((pred_full[n_train:, 0, :] - target_full[n_train:]) ** 2).mean())

    # warmup epoch (excluded from timing)
    opt.zero_grad()
    pred = dopri5(rhs, X0, tts)
    loss = ((pred[:, 0, :] - target) ** 2).mean()
    loss.backward()
    opt.step()

    curve_fh = open(curve_path, "w") if curve_path else None
    train_wall = 0.0
    best_train = float("inf")
    for epoch in range(1, n_epochs + 1):
        t0 = time.perf_counter()
        opt.zero_grad()
        pred = dopri5(rhs, X0, tts)
        loss = ((pred[:, 0, :] - target) ** 2).mean()
        loss.backward()
        opt.step()
        train_wall += time.perf_counter() - t0
        best_train = min(best_train, float(loss.detach()))
        if curve_fh:
            rec = {"epoch": epoch, "train_mse": float(loss.detach())}
            if epoch % test_every == 0 or epoch == n_epochs:
                rec["test_mse_extrap"] = test_mse()
            curve_fh.write(json.dumps(rec) + "\n")
            curve_fh.flush()
    if curve_fh:
        curve_fh.close()

    result = {
        "sec_per_epoch": train_wall / n_epochs,
        "n_epochs": n_epochs,
        "final_loss": float(loss),
        "best_train_loss": best_train,
        "final_test_mse_extrap": test_mse(),
        "config": "predprey KANFET[2,10,2] grid5 dopri5 rtol1e-7 atol1e-9 Adam 2e-3 (torch CPU)",
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
    }
    out_path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
