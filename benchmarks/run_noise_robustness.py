"""ECG200 analog-device noise-robustness study (fresh noise per step).

The capability of the reference's ``compare_noise_ecg.py``: train the same
ferro MLP-NODE classifier at several device-noise levels and compare test
accuracy. Noise is drawn fresh on every training step (an explicit PRNG
key split per minibatch inside the jitted epoch scan — the JAX equivalent
of ``torch.randn_like(...).detach()`` per forward, ``ferro_class.py:309``),
and evaluation averages logits over independent noise draws.

Usage: python benchmarks/run_noise_robustness.py [epochs]
Writes benchmarks/ecg200_noise_robustness.json with per-seed best test
accuracy at each noise level.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fetode_tpu.data.ecg200 import load_ecg200, synthetic_ecg200
from fetode_tpu.models import ecg as M
from fetode_tpu.train.ecg_driver import ECGRun, compare_noise


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    try:
        data = load_ecg200()
        source = "ECG200 (UCR)"
    except FileNotFoundError:
        data = synthetic_ecg200()
        source = "synthetic stand-in"
    T = data[0].shape[1]

    def make_model(std):
        spec = M.KanFetMLPNODESpec(T=T, noise_std=std, solver="rk4", n_steps=8)
        return (lambda k: M.kanfet_mlp_node_init(k, spec),
                lambda p, x, key: M.kanfet_mlp_node_apply(
                    p, spec, x, noise_key=key if std > 0 else None))

    stds = (0.0, 0.1, 0.2, 0.5)
    seeds = (0, 1, 2)
    run = ECGRun(epochs=epochs, batch_size=8, eval_noise_draws=4,
                 log_every=1000)
    results = compare_noise(make_model, data, noise_stds=stds, run=run,
                            seeds=seeds, log=print)

    out = {
        "source": source,
        "epochs": epochs,
        "eval_noise_draws": run.eval_noise_draws,
        "best_test_acc": {
            str(std): {str(seed): h["best_test_acc"]
                       for seed, h in per_seed.items()}
            for std, per_seed in results.items()
        },
        "final_test_acc": {
            str(std): {str(seed): h["test_acc"][-1]
                       for seed, h in per_seed.items()}
            for std, per_seed in results.items()
        },
    }
    path = os.path.join(os.path.dirname(__file__),
                        "ecg200_noise_robustness.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
