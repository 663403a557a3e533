"""Unified CLI — replaces the reference's module-constant "configs" + bare
`if __name__ == '__main__'` entry points (train.py:26-41,115; infer.py:22-26,
103; plotter.py:25; manual_classifier.py:93) with typed subcommands.

    python -m roomnet_tpu train   --data-dir ./data/REI-Dataset [--curriculum]
    python -m roomnet_tpu infer   --images-dir ./test_images [--no-overlay]
    python -m roomnet_tpu validate --list-file val_list.txt
    python -m roomnet_tpu convert --tf-ckpt /root/reference/final_model/roomnet
    python -m roomnet_tpu plot    [--stats all_train_stats.json]
    python -m roomnet_tpu plot-checkpoints --model-dir all_trained_models/...
    python -m roomnet_tpu label   --in-dir ./unlabeled
    python -m roomnet_tpu export  --out roomnet.tflite
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_variables(params_path: str, model_dir: str | None = None):
    """Load variables from a flat npz, or resume-latest from a checkpoint
    dir (reference `nn.load()` behavior, network.py:108-118)."""
    import numpy as np

    from roomnet_tpu.params import schema

    if model_dir:
        from roomnet_tpu.params.checkpoint import CheckpointStore

        loaded = CheckpointStore(model_dir).load()
        if loaded is None:
            raise FileNotFoundError(f"no checkpoints in {model_dir}")
        var_flat, step = loaded
        print(f"loaded checkpoint at step {step} from {model_dir}")
        return schema.unflatten_variables(var_flat)
    return schema.unflatten_variables(dict(np.load(params_path)))


def _model_cfg(img_side: int, *, bf16: bool):
    """Config for the requested input geometry (README.md:32: the
    reference tried 224/300/600). im_side drives flat_len, so training or
    serving a non-224 model with the 224 config would fail at compile
    with an opaque shape error. Resolution goes through the model
    registry, which owns every (geometry, precision) served config."""
    from roomnet_tpu.models import registry

    return registry.resolve(img_side, bf16=bf16)


def cmd_train(args):
    from roomnet_tpu.train.loop import TrainConfig, Trainer

    kwargs = dict(
        data_dir=args.data_dir,
        train_steps=args.steps,
        save_freq=args.save_freq,
        keep_checkpoints=args.keep_checkpoints,
        learn_rate=args.learn_rate,
        l2_coeff=args.l2,
        model_dir=args.model_dir,
        img_side=args.img_side,
        seed=args.seed,
        restore_head=not args.fresh_head,
        ckpt_backend=args.ckpt_backend,
        steps_per_call=args.steps_per_call,
        stall_timeout_s=args.stall_timeout,
        stall_abort=args.stall_abort,
        feed_mode=args.feed_mode,
        val_use_batch_stats={"phase": None, "batch": True, "moving": False}[args.val_bn],
    )
    if args.curriculum:
        kwargs["phases"] = TrainConfig.reference_curriculum(args.steps)
    tc = TrainConfig(**kwargs)
    mesh = None
    if args.data_parallel:
        from roomnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    cfg = _model_cfg(args.img_side, bf16=args.precision == "bf16")
    Trainer(tc, cfg, mesh=mesh).train()


def _maybe_mesh(args):
    """--data-parallel: an all-devices DP mesh; batch dims shard over
    'data' (SURVEY §2.4 — sharded directory inference / serving)."""
    if not getattr(args, "data_parallel", False):
        return None
    from roomnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_data = int(mesh.shape["data"])
    batch = getattr(args, "batch_size", None)
    if batch is not None and batch % n_data:
        # Checked HERE, before anything binds or compiles: P('data')
        # sharding needs divisibility, and the failure otherwise surfaces
        # as a per-request 503 device_error (serve) or an opaque jit
        # sharding error minutes in.
        raise SystemExit(
            f"--data-parallel: --batch-size {batch} is not divisible by "
            f"the {n_data}-device 'data' mesh — use a multiple of {n_data}"
        )
    return mesh


def cmd_infer(args):
    from roomnet_tpu.infer.classify import RoomNetClassifier, classify_im_dir

    cfg = _model_cfg(args.img_side, bf16=not args.exact)
    clf = RoomNetClassifier(
        _load_variables(args.params, args.model_dir), cfg,
        batch_size=args.batch_size, mesh=_maybe_mesh(args),
        fast_decode=args.fast_decode,
        device_resize_side=args.device_resize_side,
    )
    xl = classify_im_dir(clf, args.images_dir, overlay=not args.no_overlay)
    print("Results:", xl)


def cmd_validate(args):
    from roomnet_tpu.infer.classify import RoomNetClassifier, groundtruth_validation

    cfg = _model_cfg(args.img_side, bf16=not args.exact)
    clf = RoomNetClassifier(
        _load_variables(args.params, args.model_dir), cfg,
        batch_size=args.batch_size, mesh=_maybe_mesh(args),
    )
    stats = groundtruth_validation(clf, args.list_file)
    print(json.dumps(stats, indent=2))


def cmd_eval_ckpts(args):
    from roomnet_tpu.infer.classify import evaluate_checkpoints

    out = evaluate_checkpoints(
        args.model_dir, args.list_file,
        _model_cfg(args.img_side, bf16=not args.exact),
        batch_size=args.batch_size, backend=args.ckpt_backend,
        mesh=_maybe_mesh(args),
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    if args.plot:
        from roomnet_tpu.plotting.plotter import plot_eval_sweep

        print("plot:", plot_eval_sweep(out, args.plot))
    for e in out["checkpoints"]:
        name_acc = ("-" if e["name_accuracy"] is None
                    else f"{e['name_accuracy']:.4f}")
        print(f"step {e['step']:>8}  name-acc {name_acc:>6}  "
              f"measured {e['accuracy']:.4f}  {e['checkpoint']}")
    b = out["best"]
    print(f"best: step {b['step']}  accuracy {b['accuracy']:.4f}  "
          f"({b['checkpoint']})")


def cmd_doctor(args):
    """Environment/installation diagnostics: one PASS/WARN/FAIL line per
    dependency the framework's surfaces need. Exit code 1 on any FAIL."""
    import os

    checks = []  # (status, name, detail)

    def check(name, fn, *, warn_only=False):
        try:
            detail = fn()
            checks.append(("PASS", name, detail or ""))
        except Exception as e:  # noqa: BLE001 — each check reports, never raises
            checks.append(("WARN" if warn_only else "FAIL", name,
                           f"{type(e).__name__}: {e}"))

    def _jax():
        import jax

        devs = jax.devices()
        return f"jax {jax.__version__}, {len(devs)}x {devs[0].platform}"

    check("jax backend", _jax)

    def _native():
        from roomnet_tpu.data import native

        if not native.available():
            raise RuntimeError("csrc/libroomnet_io.so not built (make -C csrc); "
                               "decode falls back to cv2")
        return "fused C++ decode pipeline loaded"

    check("native data-plane", _native, warn_only=True)

    def _cv2():
        import cv2

        return f"opencv {cv2.__version__}"

    check("cv2 (decode fallback, overlays, labeler)", _cv2)

    def _params():
        import numpy as np

        from roomnet_tpu.params import schema

        path = args.params
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run `python -m roomnet_tpu convert`")
        from roomnet_tpu.models.roomnet import param_count

        n = param_count(schema.unflatten_variables(dict(np.load(path))))
        if n != 178062:
            raise ValueError(f"param count {n} != 178062")
        return f"{path}: 178,062 params"

    check("converted reference params", _params, warn_only=True)

    def _golden():
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "golden")
        need = ["forward_golden.npz", "resize_golden.npz", "valset_golden.npz"]
        missing = [f for f in need if not os.path.exists(os.path.join(base, f))]
        if missing:
            raise FileNotFoundError(", ".join(missing))
        return f"{len(need)} fixtures present"

    check("golden parity fixtures", _golden, warn_only=True)

    def _cache():
        d = "/tmp/jax_cache"
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, ".doctor_probe")
        open(probe, "w").close()
        os.unlink(probe)
        return f"{d} writable"

    check("compile cache dir", _cache, warn_only=True)

    def _tf():
        import tensorflow as tf

        return f"tensorflow {tf.__version__} (convert/export available)"

    check("tensorflow (offline convert/export only)", _tf, warn_only=True)

    width = max(len(n) for _, n, _ in checks)
    failed = False
    for status, name, detail in checks:
        print(f"[{status}] {name:<{width}}  {detail}")
        failed |= status == "FAIL"
    sys.exit(1 if failed else 0)


def cmd_convert_to_tf(args):
    from roomnet_tpu.params.export_tf import export_params_file

    path, n = export_params_file(args.params, args.out)
    print(f"exported {n} tensors -> {path} "
          f"(pair with the reference roomnet.meta)")


def cmd_convert(args):
    from roomnet_tpu.params.convert_tf import convert_tf_checkpoint, save_flat

    flat = convert_tf_checkpoint(args.tf_ckpt)
    save_flat(flat, args.out, meta={"source_tf_ckpt": args.tf_ckpt})
    print(f"converted {len(flat)} tensors -> {args.out}")


def cmd_plot(args):
    from roomnet_tpu.plotting.plotter import plot_training_stats

    outs = plot_training_stats(args.stats, args.out_dir)
    print("\n".join(outs))


def cmd_plot_checkpoints(args):
    from roomnet_tpu.plotting.plotter import plot_checkpoint_accuracies

    print(plot_checkpoint_accuracies(args.model_dir))


def cmd_label(args):
    from roomnet_tpu.data.labeler import ImageLabeler

    ImageLabeler(args.in_dir).run_labeller(resume=not args.no_resume)


def cmd_export(args):
    if args.format == "saved-model" and args.quantize:
        raise SystemExit("--quantize applies to TFLite only")
    # Default --out is per-format: a SavedModel is a DIRECTORY tree, and
    # writing it to the tflite default would produce roomnet.tflite/ —
    # a dir with a flatbuffer extension that downstream tooling mis-reads.
    out_path = args.out or (
        "artifacts/roomnet_saved_model" if args.format == "saved-model"
        else "artifacts/roomnet.tflite"
    )
    variables = _load_variables(args.params, getattr(args, "model_dir", None))
    # Both formats are float32 serving artifacts: exact geometry, never
    # the bf16 config.
    cfg = _model_cfg(args.img_side, bf16=False)
    if args.format == "saved-model":
        from roomnet_tpu.params.export import export_saved_model

        out = export_saved_model(variables, out_path, cfg=cfg)
    else:
        from roomnet_tpu.params.export import export_tflite

        out = export_tflite(variables, out_path, cfg=cfg,
                            quantize=args.quantize)
    print("exported:", out)


def cmd_serve(args):
    from roomnet_tpu.infer.classify import RoomNetClassifier
    from roomnet_tpu.infer.server import ClassifierServer

    cfg = _model_cfg(args.img_side, bf16=not args.exact)
    clf = RoomNetClassifier(
        _load_variables(args.params, args.model_dir), cfg,
        batch_size=args.batch_size, mesh=_maybe_mesh(args),
    )
    if args.profile_port:
        from roomnet_tpu.utils.profiling import start_server

        start_server(args.profile_port)
        print(f"jax profiler server on :{args.profile_port} "
              f"(capture with XProf/TensorBoard)")
    print(f"serving on http://{args.host}:{args.port}  "
          f"(POST /classify, /classify_batch)")
    ClassifierServer(clf, host=args.host, port=args.port,
                     warmup=not args.no_warmup,
                     max_inflight=args.max_inflight,
                     request_timeout_s=args.request_timeout,
                     # Same dir the weights came from: POST /reload
                     # hot-swaps to its newest checkpoint.
                     model_dir=args.model_dir,
                     auto_reload_s=args.auto_reload,
                     access_log=args.access_log,
                     drain_s=args.drain).serve_forever()


def cmd_bench(args):
    # bench.py lives at the repo root, one level above the package — make it
    # importable regardless of the caller's working directory.
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="roomnet_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train / fine-tune (reference train.py)")
    t.add_argument("--data-dir", default="./data/REI-Dataset")
    t.add_argument("--steps", type=int, default=100_000)
    t.add_argument("--save-freq", type=int, default=10)
    t.add_argument("--keep-checkpoints", type=int, default=None, metavar="N",
                   help="opt-in retention: keep only the newest N regular "
                        "checkpoints (+ the best-accuracy one + all "
                        "interrupt/stall markers); default keep-all, the "
                        "reference contract")
    t.add_argument("--learn-rate", type=float, default=2e-4)
    t.add_argument("--l2", type=float, default=6e-2)
    t.add_argument("--model-dir", default="all_trained_models/trained_models")
    t.add_argument("--img-side", type=int, default=224)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan); "
                        ">1 only helps genuinely dispatch-bound hosts "
                        "(PERF.md round 3)")
    t.add_argument("--fresh-head", action="store_true",
                   help="exclude the dense head on restore (network.py:78)")
    t.add_argument("--curriculum", action="store_true",
                   help="README.md:34-38 batch/dropout/BN-freeze schedule")
    t.add_argument("--feed-mode", choices=["replicated", "sharded"],
                   default="replicated",
                   help="multi-process input mode: sharded = each process "
                        "decodes only its row slice (pod data plane)")
    t.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    t.add_argument("--ckpt-backend", choices=["npz", "orbax"], default="npz",
                   help="checkpoint store: portable npz or async orbax")
    t.add_argument("--stall-timeout", type=float, default=600.0,
                   help="watchdog: warn + emergency-checkpoint when no step "
                        "completes for this many seconds (0 disables)")
    t.add_argument("--stall-abort", action="store_true",
                   help="watchdog escalation: interrupt training after the "
                        "emergency checkpoint (clean shutdown path)")
    t.add_argument("--val-bn", choices=["phase", "batch", "moving"],
                   default="phase",
                   help="validation BN statistics: 'phase' follows the "
                        "active phase's compute_bn_mean_var (reference "
                        "nn.infer semantics), or force batch/moving stats")
    t.add_argument("--precision", choices=["bf16", "f32"], default="bf16",
                   help="bf16 = fast mixed-precision (default; f32 params, "
                        "bf16 compute); f32 = full-precision parity mode")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer", help="classify a directory (reference infer.py)")
    i.add_argument("--images-dir", required=True)
    i.add_argument("--params", default="artifacts/roomnet_params.npz")
    i.add_argument("--model-dir", default=None,
                   help="resume-latest from a training checkpoint dir "
                        "instead of --params")
    i.add_argument("--batch-size", type=int, default=64)
    i.add_argument("--no-overlay", action="store_true")
    i.add_argument("--exact", action="store_true",
                   help="f32 parity mode instead of bf16 serving mode")
    i.add_argument("--img-side", type=int, default=224,
                   help="model input geometry; must match the loaded "
                        "weights' dense head (README.md:32 variants)")
    i.add_argument("--device-resize-side", type=int, default=None,
                   help="ship center-cropped uint8 at this side and run the "
                        "final resample on device (PCIe hosts with at-size "
                        "sources; see docs/operations.md)")
    i.add_argument("--fast-decode", action="store_true",
                   help="DCT-scaled JPEG decode (needs csrc/; >=2x "
                        "supersampling enforced — PERF.md for measured "
                        "flip rates on large sources)")
    i.add_argument("--data-parallel", action="store_true",
                   help="shard batches over an all-devices 'data' mesh "
                        "(multi-chip hosts; batch size must divide by the "
                        "device count)")
    i.set_defaults(fn=cmd_infer)

    v = sub.add_parser("validate", help="score a labeled list file")
    v.add_argument("--list-file", required=True)
    v.add_argument("--params", default="artifacts/roomnet_params.npz")
    v.add_argument("--model-dir", default=None,
                   help="resume-latest from a training checkpoint dir "
                        "instead of --params")
    v.add_argument("--batch-size", type=int, default=64)
    v.add_argument("--exact", action="store_true")
    v.add_argument("--img-side", type=int, default=224,
                   help="model input geometry; must match the loaded "
                        "weights' dense head (README.md:32 variants)")
    v.add_argument("--data-parallel", action="store_true",
                   help="shard batches over an all-devices 'data' mesh "
                        "(multi-chip hosts; batch size must divide by the "
                        "device count)")
    v.set_defaults(fn=cmd_validate)

    ev = sub.add_parser(
        "eval-ckpts",
        help="re-score EVERY checkpoint in a dir against one list file "
             "(consistent model selection vs the filename accuracies "
             "legacy_plotter.py trusts)",
    )
    ev.add_argument("--model-dir", required=True)
    ev.add_argument("--list-file", required=True)
    ev.add_argument("--batch-size", type=int, default=64)
    ev.add_argument("--exact", action="store_true")
    ev.add_argument("--img-side", type=int, default=224)
    ev.add_argument("--out", default=None,
                    help="also write the full per-checkpoint JSON here")
    ev.add_argument("--ckpt-backend", choices=["auto", "npz", "orbax"],
                    default="auto",
                    help="checkpoint store format in --model-dir "
                         "(auto: npz files win if present)")
    ev.add_argument("--plot", default=None, metavar="PNG",
                    help="also render measured-vs-filename accuracy by step")
    ev.add_argument("--data-parallel", action="store_true",
                   help="shard batches over an all-devices 'data' mesh "
                        "(multi-chip hosts; batch size must divide by the "
                        "device count)")
    ev.set_defaults(fn=cmd_eval_ckpts)

    c = sub.add_parser("convert", help="TF checkpoint -> native params")
    c.add_argument("--tf-ckpt", default="/root/reference/final_model/roomnet")
    c.add_argument("--out", default="artifacts/roomnet_params.npz")
    c.set_defaults(fn=cmd_convert)

    c2 = sub.add_parser(
        "convert-to-tf",
        help="native params -> TF1 checkpoint the reference graph restores "
             "by name (train here, deploy on reference infra)",
    )
    c2.add_argument("--params", default="artifacts/roomnet_params.npz")
    c2.add_argument("--out", default="exported_tf/roomnet",
                    help="TF checkpoint prefix to write")
    c2.set_defaults(fn=cmd_convert_to_tf)

    pl = sub.add_parser("plot", help="stats JSON -> 4 PNGs (reference plotter.py)")
    pl.add_argument("--stats", default="all_train_stats.json")
    pl.add_argument("--out-dir", default="performance_plots")
    pl.set_defaults(fn=cmd_plot)

    lp = sub.add_parser("plot-checkpoints",
                        help="accuracy from ckpt names (legacy_plotter.py)")
    lp.add_argument("--model-dir", required=True)
    lp.set_defaults(fn=cmd_plot_checkpoints)

    lb = sub.add_parser("label", help="manual labeling tool (manual_classifier.py)")
    lb.add_argument("--in-dir", required=True)
    lb.add_argument("--no-resume", action="store_true")
    lb.set_defaults(fn=cmd_label)

    e = sub.add_parser(
        "export",
        help="export to TFLite (pure builtins, stock-interpreter loadable) "
             "or a TF SavedModel (TF-Serving containers)")
    e.add_argument("--params", default="artifacts/roomnet_params.npz")
    e.add_argument("--model-dir", default=None,
                   help="resume-latest from a training checkpoint dir")
    e.add_argument("--out", default=None,
                   help="output path (default: artifacts/roomnet.tflite, "
                        "or artifacts/roomnet_saved_model for saved-model)")
    e.add_argument("--format", choices=["tflite", "saved-model"],
                   default="tflite",
                   help="saved-model: polymorphic-batch SavedModel dir "
                        "(forward+softmax+argmax) for TF-Serving")
    e.add_argument("--quantize", choices=["dynamic", "int8"], default=None,
                   help="quantized variant (mobile/README.md for measured "
                        "flip rates; dynamic is the shipped winner)")
    e.add_argument("--img-side", type=int, default=224,
                   help="model input geometry; must match the loaded "
                        "weights' dense head")
    e.set_defaults(fn=cmd_export)

    s = sub.add_parser("serve", help="HTTP classification daemon")
    s.add_argument("--params", default="artifacts/roomnet_params.npz")
    s.add_argument("--model-dir", default=None,
                   help="resume-latest from a training checkpoint dir "
                        "instead of --params")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--batch-size", type=int, default=32)
    s.add_argument("--exact", action="store_true")
    s.add_argument("--img-side", type=int, default=224,
                   help="model input geometry; must match the loaded "
                        "weights' dense head (README.md:32 variants)")
    s.add_argument("--no-warmup", action="store_true",
                   help="skip the compile-before-bind warmup")
    s.add_argument("--max-inflight", type=int, default=None,
                   help="admission cap before 429 shedding "
                        "(default 4x max_batch)")
    s.add_argument("--access-log", default=None, metavar="PATH",
                   help="append one JSON line per answered request "
                        "(method, path, status, ms)")
    s.add_argument("--auto-reload", type=float, default=None, metavar="S",
                   help="poll --model-dir every S seconds and hot-swap when "
                        "a newer checkpoint lands (a live trainer's output "
                        "starts serving with no /reload call)")
    s.add_argument("--profile-port", type=int, default=None,
                   help="start the jax profiler gRPC server on this port "
                        "for on-demand XProf/TensorBoard trace capture of "
                        "the live daemon")
    s.add_argument("--drain", type=float, default=0.0, metavar="S",
                   help="graceful-drain window on SIGTERM/Ctrl-C: /readyz "
                        "goes 503, new classify work is shed with 503, and "
                        "admitted requests get up to S seconds to finish "
                        "before shutdown (0: immediate, queued jobs fail "
                        "fast)")
    s.add_argument("--request-timeout", type=float, default=30.0,
                   help="per-request budget cap (s), stamped at admission; "
                        "clients may lower it per-request via the "
                        "X-Timeout-Seconds header")
    s.add_argument("--data-parallel", action="store_true",
                   help="shard batches over an all-devices 'data' mesh "
                        "(multi-chip hosts; batch size must divide by the "
                        "device count)")
    s.set_defaults(fn=cmd_serve)

    d = sub.add_parser("doctor", help="environment diagnostics (PASS/WARN/FAIL)")
    d.add_argument("--params", default="artifacts/roomnet_params.npz")
    d.set_defaults(fn=cmd_doctor)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)
    return p


def _enable_compile_cache():
    """Persistent XLA compile cache: every CLI invocation is a fresh
    process, and an uncached full-model compile costs minutes on a
    remote compiler. Honors JAX_COMPILATION_CACHE_DIR; default under
    the user cache dir. Best-effort (old jax versions, read-only fs)."""
    import os

    try:
        import jax

        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "roomnet_tpu", "jax_cache",
            ),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# Subcommands that compile on a device. Everything else (plot, doctor,
# label, the TF converters, --help) must keep the module's lazy-import
# design: no multi-second jax import, no cache-dir mkdir.
_DEVICE_CMDS = frozenset(
    ("cmd_train", "cmd_infer", "cmd_validate", "cmd_serve", "cmd_bench",
     "cmd_export", "cmd_eval_ckpts")
)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.fn.__name__ in _DEVICE_CMDS:
        _enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
