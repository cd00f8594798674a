"""Real ECG200 runs (100 train / 100 test), reference protocol: 100
epochs, batch 8, AdamW.  Records best test accuracy + wall per model,
including the ferro MLP-NODE through the whole-solve in-kernel adjoint
(`solver_mode="pallas"`, ops/pallas_ferro_node.py) next to the scan path
— accuracy parity + wall evidence on real data.

Usage: python benchmarks/run_ecg200_real.py [model ...]
Models: kanfet_node kanfet_mlp_node kanfet_mlp_node_pallas
        kanfet_mlp_node_noisy kanfet_mlp_node_noisy_pallas digital_rnn
(the _noisy pair trains with device noise std 0.2, frozen per solve,
evaluated with 4-draw averaging; _noisy_pallas exercises the in-kernel
noise path)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetode_tpu.data.ecg200 import load_ecg200  # noqa: E402
from fetode_tpu.models import ecg as M  # noqa: E402
from fetode_tpu.nn.rnn import (  # noqa: E402
    DigitalRNNConfig,
    digital_rnn_apply,
    digital_rnn_init,
)
from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model  # noqa: E402


def builders(name, T, num_classes):
    if name in ("kanfet_node", "kanfet_node_pallas"):
        mode = "pallas" if name.endswith("pallas") else "scan"
        spec = M.KanFetNODESpec(T=T, num_classes=num_classes,
                                solver_mode=mode)
        return (lambda k: M.kanfet_node_init(k, spec),
                lambda p, x, key: M.kanfet_node_apply(p, spec, x))
    if name in ("kanfet_mlp_node", "kanfet_mlp_node_pallas"):
        mode = "pallas" if name.endswith("pallas") else "scan"
        spec = M.KanFetMLPNODESpec(T=T, num_classes=num_classes,
                                   solver_mode=mode)
        return (lambda k: M.kanfet_mlp_node_init(k, spec),
                lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x))
    if name in ("kanfet_mlp_node_noisy", "kanfet_mlp_node_noisy_pallas"):
        # device noise at the reference's default std (ferro_class.py:238),
        # frozen per solve (dopri5 semantics), fresh key per training step;
        # the pallas variant exercises the in-kernel noise path
        mode = "pallas" if name.endswith("pallas") else "scan"
        spec = M.KanFetMLPNODESpec(T=T, num_classes=num_classes,
                                   solver_mode=mode, noise_std=0.2)
        return (lambda k: M.kanfet_mlp_node_init(k, spec),
                lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x,
                                                          noise_key=key))
    if name == "digital_rnn":
        cfg = DigitalRNNConfig(input_size=1, hidden_size=64,
                               num_classes=num_classes)
        return (lambda k: digital_rnn_init(k, cfg),
                lambda p, x, key: digital_rnn_apply(p, cfg, x))
    raise ValueError(name)


def main():
    names = sys.argv[1:] or ["kanfet_node", "kanfet_node_pallas",
                             "kanfet_mlp_node", "kanfet_mlp_node_pallas",
                             "digital_rnn"]
    x_train, y_train, x_test, y_test = load_ecg200()
    data = (x_train, y_train, x_test, y_test)
    T = x_train.shape[1]
    n_cls = int(max(y_train.max(), y_test.max())) + 1

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "ecg200_real_runs.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    epc = int(os.environ.get("ECG_EPOCHS_PER_CALL", "1"))
    for name in names:
        init_fn, apply_fn = builders(name, T, n_cls)
        run = ECGRun(epochs_per_call=epc,
                     eval_noise_draws=4 if "noisy" in name else 1)
        _, hist = train_ecg_model(init_fn, apply_fn, data, run, log=None)
        key = name if epc == 1 else f"{name}_blk{epc}"
        results[key] = {"best_test_acc": hist["best_test_acc"],
                        "wall": round(hist["wall_seconds"], 2)}
        print(key, json.dumps(results[key]), flush=True)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
