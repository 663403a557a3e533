"""Performance plotters: regenerate the reference's four PNGs + legacy plot.

Reference parity:
  * `plot_training_stats` = plotter.py:25-112 — accuracy plot + per-class
    F-score/recall/precision plots from the stats JSON, sorted by step,
    best-model annotations in titles;
  * `plot_checkpoint_accuracies` = legacy_plotter.py:19-37 — accuracy curve
    parsed out of checkpoint *filenames* (`--{acc}--{step}`), which works on
    our `roomnet--{acc}--{step}.npz` names the same way.
"""

from __future__ import annotations

import json
import os
import re
from glob import glob

import numpy as np

CLASS_COLORS = (
    np.array(
        [(244, 35, 231), (69, 69, 69), (219, 219, 0), (0, 0, 142), (0, 79, 100), (119, 10, 32)]
    ).astype(np.float32)
    / 255.0
)


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_training_stats(
    stats_json: str = "all_train_stats.json",
    out_dir: str = "performance_plots",
    class_labels: list[str] | None = None,
    val_size: int | str = 1839,
) -> list[str]:
    """Render accuracy/fscore/recall/precision PNGs from the stats JSON."""
    from roomnet_tpu import CLASS_LABELS

    plt = _plt()
    class_labels = class_labels or CLASS_LABELS
    os.makedirs(out_dir, exist_ok=True)
    with open(stats_json) as f:
        stats = json.load(f)
    steps = np.array([s["step"] for s in stats])
    order = np.argsort(steps)
    steps = steps[order]
    accs = np.array([s["accuracy"] for s in stats])[order]

    def ragged(key):
        # The reference's own committed stats file mixes 4-, 6- and 67-class
        # entries (it was reused across datasets/runs); pad ragged rows with
        # NaN — matplotlib leaves gaps — instead of crashing like a plain
        # np.array() would.
        rows = [s[key] for s in stats]
        width = max(len(r) for r in rows)
        arr = np.full((len(rows), width), np.nan)
        for i, r in enumerate(rows):
            arr[i, : len(r)] = r
        return arr[order]

    per_class = {
        "fscore": ragged("f-scores"),
        "recall": ragged("recalls"),
        "precision": ragged("precisions"),
    }

    outputs = []
    acc_path = os.path.join(out_dir, "accuracy_plot.png")
    plt.clf()
    plt.plot(steps, accs, "-", color="red", label="Classification Accuracy")
    plt.title(
        f"Model with max overall score is at step {steps[accs.argmax()]}"
        f"\nwith value {accs.max()}"
    )
    plt.legend(loc="best")
    plt.xlabel("Train Step")
    plt.ylabel(f"Validation Overall Accuracy over {val_size} images")
    plt.savefig(acc_path, bbox_inches="tight", dpi=200)
    outputs.append(acc_path)

    for name, arr in per_class.items():
        path = os.path.join(out_dir, f"{name}_plot.png")
        plt.clf()
        plt.figure(figsize=(20, 20))
        title = "Best Overall class performers -\n"
        n = min(arr.shape[1], len(class_labels))
        for i in range(n):
            color = CLASS_COLORS[i % len(CLASS_COLORS)]
            plt.plot(steps, arr[:, i], "-", color=color, label=class_labels[i])
            best = np.nanargmax(arr[:, i])  # NaN-padded ragged rows
            title += (
                f"{class_labels[i]}---> model at step {steps[best]} "
                f"with value {arr[best, i]}\n"
            )
        plt.title(title)
        plt.legend(loc="best")
        plt.xlabel("Train Step")
        plt.ylabel(f"Validation Class {name} over {val_size} images")
        plt.savefig(path, bbox_inches="tight", dpi=200)
        plt.close("all")
        outputs.append(path)
    return outputs


CKPT_NAME_RE = re.compile(r"--(?P<acc>[\d.eE+-]+)--(?P<step>\d+)\.(npz|meta)$")


def plot_checkpoint_accuracies(model_dir: str, out_path: str | None = None) -> str:
    """Accuracy curve from checkpoint filenames (legacy_plotter.py:19-37)."""
    plt = _plt()
    paths = glob(os.path.join(model_dir, "*roomnet*"))
    pairs = []
    for p in paths:
        m = CKPT_NAME_RE.search(os.path.basename(p))
        if m:
            try:
                pairs.append((int(m.group("step")), float(m.group("acc"))))
            except ValueError:
                continue
    if not pairs:
        raise FileNotFoundError(f"no acc-named checkpoints in {model_dir}")
    pairs.sort()
    steps = np.array([s for s, _ in pairs])
    accs = np.array([a for _, a in pairs])
    out_path = out_path or (model_dir.rstrip(os.sep) + "_accuracy_plot.png")
    plt.clf()
    plt.plot(steps, accs, "-", color="red", label="Classification Accuracy")
    plt.title(
        f"Model with max overall score is at step {steps[accs.argmax()]}"
        f"\nwith value {accs.max()}"
    )
    plt.legend(loc="best")
    plt.xlabel("Train Step")
    plt.ylabel("Validation Overall Accuracy")
    plt.savefig(out_path, bbox_inches="tight", dpi=200)
    return out_path


def plot_eval_sweep(eval_result: dict, out_path: str) -> str:
    """Measured-vs-filename accuracy by step, from an
    `infer.classify.evaluate_checkpoints` result. The gap between the
    two curves is the point of eval-ckpts: filename accuracies were
    scored against whatever val set was live during each run
    (legacy_plotter.py trusts them); the measured curve uses one
    consistent list file."""
    plt = _plt()
    entries = eval_result["checkpoints"]
    steps = np.array([e["step"] for e in entries])
    measured = np.array([e["accuracy"] for e in entries])
    named = [(e["step"], e["name_accuracy"]) for e in entries
             if e["name_accuracy"] is not None]
    plt.clf()
    plt.plot(steps, measured, "-o", color="red", label="Measured Accuracy")
    if named:
        plt.plot([s for s, _ in named], [a for _, a in named], "--x",
                 color="gray", label="Filename Accuracy")
    best = eval_result["best"]
    plt.title(f"Best measured model is at step {best['step']}"
              f"\nwith value {best['accuracy']}")
    plt.legend(loc="best")
    plt.xlabel("Train Step")
    plt.ylabel("Accuracy on the evaluation list")
    plt.savefig(out_path, bbox_inches="tight", dpi=200)
    return out_path
