"""From-scratch training at scale on the synthetic 6-class dataset, through
the full reference curriculum (VERDICT round-1 item #2).

Reproduces the reference's training PROCESS end to end (train.py:115-158 +
the README.md:34-38 hand-run curriculum, here declarative): four phases
(batch 8 -> 32 -> 40 -> 45, BN batch-stats -> frozen, dropout toggling),
periodic full-val-epoch metrics in the reference stats-JSON schema,
acc-named keep-all checkpoints, resume-latest. bf16 compute (FAST_CONFIG):
f32-HIGHEST parity-mode compiles take minutes PER PHASE SHAPE on the
remote compiler and change nothing about the dynamics being validated.

    python tools/train_synth.py --steps 6000 --workdir /tmp/synth_run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--data-dir", default="/tmp/synth_rooms")
    ap.add_argument("--per-class", type=int, default=600)
    ap.add_argument("--workdir", default="/tmp/synth_run")
    ap.add_argument("--save-freq", type=int, default=100)
    ap.add_argument("--learn-rate", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.data_dir, "Kitchen")):
        from tools.make_synth_dataset import generate

        print("generating synthetic dataset ...")
        generate(args.data_dir, args.per_class, args.seed)

    os.makedirs(args.workdir, exist_ok=True)
    from roomnet_tpu.models.roomnet import FAST_CONFIG
    from roomnet_tpu.train.loop import TrainConfig, Trainer

    tc = TrainConfig(
        data_dir=args.data_dir,
        train_list_fpath=os.path.join(args.workdir, "train_list.txt"),
        val_list_fpath=os.path.join(args.workdir, "val_list.txt"),
        stats_fpath=os.path.join(args.workdir, "all_train_stats.json"),
        model_dir=os.path.join(args.workdir, "models"),
        img_side=224,
        train_steps=100_000,  # LR decay horizon (reference train.py:31)
        save_freq=args.save_freq,
        learn_rate=args.learn_rate,
        l2_coeff=6e-2,
        val_batch_size=64,
        seed=args.seed,
        phases=TrainConfig.reference_curriculum(total_steps=args.steps),
        stall_timeout_s=900.0,
    )
    t0 = time.time()
    trainer = Trainer(tc, FAST_CONFIG)
    state = trainer.train(total_steps=args.steps, log_every=25)
    wall = time.time() - t0

    stats = (
        json.load(open(tc.stats_fpath)) if os.path.isfile(tc.stats_fpath) else []
    )
    if not stats:  # steps < save_freq: no validation ever ran
        print(json.dumps({"steps": int(state.step), "wall_s": round(wall, 1),
                          "n_validations": 0}))
        return
    best = max(stats, key=lambda s: s["accuracy"])
    tail = [s["accuracy"] for s in stats[-5:]]
    from roomnet_tpu.train.loop import phase_at

    images_seen = sum(phase_at(tc.phases, s).batch_size for s in range(args.steps))
    summary = {
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "img_per_s_train_incl_val": round(images_seen / wall, 1),
        "best_accuracy": best["accuracy"],
        "best_step": best["step"],
        "final_accuracies": tail,
        "n_validations": len(stats),
        "phases": [dataclasses.asdict(p) for p in tc.phases],
    }
    with open(os.path.join(args.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    # Convergence plots via the reference-schema plotter.
    try:
        from roomnet_tpu.plotting.plotter import plot_training_stats

        with open(tc.val_list_fpath) as f:
            n_val = sum(1 for l in f if l.strip())
        plot_training_stats(tc.stats_fpath, out_dir=args.workdir, val_size=n_val)
        print("plots written to", args.workdir)
    except Exception as e:  # plotting must never kill a finished run
        print("plotting failed:", e)


if __name__ == "__main__":
    main()
