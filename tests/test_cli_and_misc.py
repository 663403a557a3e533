"""CLI parser, model registry, profiling utils, plotters, labeler."""

import argparse
import json
import os

import numpy as np
import pytest

from roomnet_tpu.cli import build_parser
from roomnet_tpu.models import registry


def test_cli_parses_all_subcommands():
    p = build_parser()
    for argv in [
        ["train", "--data-dir", "/x", "--curriculum"],
        ["infer", "--images-dir", "/x", "--no-overlay", "--exact"],
        ["validate", "--list-file", "/x"],
        ["eval-ckpts", "--model-dir", "/m", "--list-file", "/x"],
        ["convert"],
        ["plot"],
        ["plot-checkpoints", "--model-dir", "/m"],
        ["label", "--in-dir", "/x"],
        ["serve", "--port", "0"],
        ["serve", "--data-parallel", "--drain", "10"],
        ["infer", "--images-dir", "/x", "--data-parallel"],
        ["validate", "--list-file", "/x", "--data-parallel"],
        ["eval-ckpts", "--model-dir", "/m", "--list-file", "/x",
         "--data-parallel"],
        ["export", "--quantize", "dynamic"],
        ["export", "--format", "saved-model", "--out", "/tmp/sm"],
        ["bench"],
        ["doctor"],
    ]:
        args = p.parse_args(argv)
        assert callable(args.fn)


def test_every_args_attribute_each_handler_reads_is_parsed():
    """Every `args.X` a cmd_* handler reads must exist on its subcommand's
    parsed namespace — the add-a-flag-to-the-handler-but-not-the-parser
    bug class, caught statically for ALL subcommands at once (the
    handlers otherwise only fail at runtime, on a device-facing path)."""
    import ast
    import inspect

    from roomnet_tpu import cli

    sub_cmds = {
        "train": ["train", "--data-dir", "/x"],
        "infer": ["infer", "--images-dir", "/x"],
        "validate": ["validate", "--list-file", "/x"],
        "eval-ckpts": ["eval-ckpts", "--model-dir", "/m", "--list-file", "/x"],
        "convert": ["convert"],
        "convert-to-tf": ["convert-to-tf"],
        "plot": ["plot"],
        "plot-checkpoints": ["plot-checkpoints", "--model-dir", "/m"],
        "label": ["label", "--in-dir", "/x"],
        "export": ["export"],
        "serve": ["serve"],
        "bench": ["bench"],
        "doctor": ["doctor"],
    }
    p = build_parser()
    checked = 0
    for name, argv in sub_cmds.items():
        ns = p.parse_args(argv)
        tree = ast.parse(inspect.getsource(ns.fn))
        reads = {
            node.attr
            for node in ast.walk(tree)
            if isinstance(node, ast.Attribute)
            and isinstance(node.value, ast.Name) and node.value.id == "args"
        }
        # getattr(args, "x", default) reads are optional by construction
        missing = [a for a in reads if not hasattr(ns, a)]
        assert not missing, f"{name}: handler reads args.{missing} " \
                            f"but the parser never defines them"
        checked += len(reads)
    assert checked > 40  # the walk actually saw the handlers' reads


def test_doctor_reports_and_exits_clean(capsys):
    from roomnet_tpu.cli import cmd_doctor

    ns = argparse.Namespace(params="artifacts/roomnet_params.npz")
    with pytest.raises(SystemExit) as e:
        cmd_doctor(ns)
    assert e.value.code == 0  # this container: everything present
    out = capsys.readouterr().out
    assert "[PASS] jax backend" in out
    assert "FAIL" not in out
    # a missing params file is a WARN (doctor still exits 0), never a crash
    ns = argparse.Namespace(params="/nonexistent/params.npz")
    with pytest.raises(SystemExit) as e:
        cmd_doctor(ns)
    assert e.value.code == 0
    assert "[WARN] converted reference params" in capsys.readouterr().out


def test_cli_model_cfg_selects_geometry():
    """--img-side must drive the MODEL config, not just the data loader:
    224 returns the canonical configs unchanged; 300/600 (README.md:32)
    return validated variants; a collapsing geometry raises up front
    instead of as an opaque compile-time shape error."""
    from roomnet_tpu.cli import _model_cfg
    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, FAST_CONFIG

    assert _model_cfg(224, bf16=False) is DEFAULT_CONFIG
    assert _model_cfg(224, bf16=True) is FAST_CONFIG
    cfg300 = _model_cfg(300, bf16=False)
    assert cfg300.im_side == 300
    assert cfg300.compute_dtype == DEFAULT_CONFIG.compute_dtype
    assert _model_cfg(600, bf16=True).compute_dtype == FAST_CONFIG.compute_dtype
    with pytest.raises(ValueError):
        _model_cfg(64, bf16=False)
    # and the flag parses on every device-facing subcommand
    p = build_parser()
    for argv in [
        ["train", "--img-side", "300"],
        ["infer", "--images-dir", "/x", "--img-side", "300"],
        ["validate", "--list-file", "/x", "--img-side", "300"],
        ["serve", "--img-side", "300"],
    ]:
        assert p.parse_args(argv).img_side == 300


def test_bench_backend_retry_recovers_after_failure():
    """bench._wait_for_backend must really re-attempt init after a failed
    try (jax caches failed platforms for the process lifetime): a wedged
    axon tunnel recovers BETWEEN attempts, so a cached-error spin loop
    would produce no BENCH artifact. Subprocess: clearing live backends
    mid-suite would invalidate other tests' arrays."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'bogus')\n"
        "import bench\n"
        "try:\n"
        "    bench._wait_for_backend(3)\n"
        "    raise SystemExit('should have raised')\n"
        "except RuntimeError:\n"
        "    pass\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "bench._wait_for_backend(5)\n"
        "print('RECOVERED')\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="")
    out = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "RECOVERED" in out.stdout
    # and at least one real retry happened (not an instant cached re-raise)
    assert "attempt 1 failed" in out.stderr


def test_bench_emits_outage_artifact_when_backend_never_appears():
    """If the backend stays UNAVAILABLE past the full retry window (the
    measured multi-hour axon tunnel outage), bench.main() must still
    print ONE JSON line — an explicit outage record with null values,
    never a stack trace and no artifact. Subprocess for the same
    backend-isolation reason as the retry test above."""
    import json as _json
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'bogus')\n"
        "import bench\n"
        "bench.main()\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="", BENCH_BACKEND_DEADLINE_S="2")
    out = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    rec = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert "unavailable" in rec["extras"]["error"].lower()
    assert rec["extras"]["last_good_artifact"] == "BENCH_r03.json"


def test_registry_variants():
    assert "roomnet-224" in registry.names()
    assert registry.get("roomnet-300").im_side == 300
    assert registry.get("roomnet-600").im_side == 600
    with pytest.raises(KeyError):
        registry.get("nope")


def test_registry_precision_symmetry_and_resolve():
    """Every reference geometry (README.md:32) exists in BOTH precisions,
    and `resolve` — the CLI's path — returns the canonical registry entry
    for them (round-4 review weak #6: roomnet-300-bf16 was missing, so
    serving the 300 geometry in the fast dtype required a hand-built
    config)."""
    import jax.numpy as jnp

    for side in (224, 300, 600):
        f32 = registry.get(f"roomnet-{side}")
        bf16 = registry.get(f"roomnet-{side}-bf16")
        assert f32.im_side == bf16.im_side == side
        assert f32.compute_dtype == jnp.float32
        assert bf16.compute_dtype == jnp.bfloat16
        # resolve() is identity onto the registry for registered configs
        assert registry.resolve(side, bf16=False) is f32
        assert registry.resolve(side, bf16=True) is bf16
        # every bf16 entry shares FAST_CONFIG's lowerings and every f32
        # entry the parity ones (round-5 regression: 300/600-bf16 were
        # derived DEFAULT+dtype, silently missing pool_impl="auto" when
        # FAST_CONFIG gained it)
        from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, FAST_CONFIG

        assert bf16.pool_impl == FAST_CONFIG.pool_impl
        assert f32.pool_impl == DEFAULT_CONFIG.pool_impl
    # unregistered geometry: derived + validated, right precision
    assert registry.resolve(256, bf16=True).compute_dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        registry.resolve(64, bf16=False)  # collapses below the geometry floor


def test_cli_model_cfg_resolves_through_registry():
    from roomnet_tpu.cli import _model_cfg

    assert _model_cfg(300, bf16=True) is registry.get("roomnet-300-bf16")
    assert _model_cfg(224, bf16=False) is registry.get("roomnet-224")


def test_registry_validates_geometry():
    import dataclasses

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG

    with pytest.raises(ValueError):
        registry.validate(dataclasses.replace(DEFAULT_CONFIG, im_side=64))
    registry.validate(DEFAULT_CONFIG)  # ok


def test_registry_300_600_geometry_is_valid_and_runs():
    """Forward actually executes at the alternate input sizes the reference
    experimented with (README.md:32)."""
    import jax

    from roomnet_tpu.models.roomnet import forward, init_variables

    cfg = registry.get("roomnet-300")
    v = init_variables(jax.random.PRNGKey(0), cfg)
    x = np.zeros((1, 300, 300, 3), np.float32)
    out = forward(v, x, cfg)
    assert out.shape == (1, 6)


def test_step_timer_and_trace_spans():
    from roomnet_tpu.utils import profiling

    profiling.SPANS.reset()
    with profiling.trace("unit_span"):
        pass
    s = profiling.SPANS.summary()
    assert "unit_span" in s and s["unit_span"]["count"] == 1
    assert "p50_ms" in s["unit_span"] and "p99_ms" in s["unit_span"]

    # percentiles over a known population: 1..100 ms-ish spread
    profiling.SPANS.reset()
    for i in range(1, 101):
        profiling.SPANS.add("pct_span", i / 1000.0)
    p = profiling.SPANS.summary()["pct_span"]
    assert abs(p["p50_ms"] - 51) <= 2, p
    assert p["p99_ms"] >= 99, p
    # ring bound: a long-lived span never grows beyond the window
    for i in range(2000):
        profiling.SPANS.add("ring_span", 0.001)
    assert len(profiling.SPANS._recent["ring_span"]) <= profiling.SPANS.RING

    # eviction order: the FIRST sample (a compile-inflated outlier, say)
    # must leave the window after exactly RING further adds — not survive
    # a whole extra wrap (off-by-one regression)
    profiling.SPANS.reset()
    profiling.SPANS.add("evict_span", 99.0)  # outlier first sample
    for _ in range(profiling.SPANS.RING):
        profiling.SPANS.add("evict_span", 0.001)
    assert 99.0 not in profiling.SPANS._recent["evict_span"]
    assert profiling.SPANS.summary()["evict_span"]["p99_ms"] < 10

    t = profiling.StepTimer()
    first = t.tick(8)
    second = t.tick(8)
    assert "avg_images_per_sec" in first
    assert "images_per_sec" in second and second["images_per_sec"] > 0


def test_plot_training_stats(tmp_path):
    stats = [
        {"step": s, "accuracy": 0.5 + s / 1000,
         "precisions": [0.5] * 6, "recalls": [0.5] * 6, "f-scores": [0.5] * 6}
        for s in (30, 10, 20)
    ]
    sp = tmp_path / "stats.json"
    sp.write_text(json.dumps(stats))
    from roomnet_tpu.plotting.plotter import plot_training_stats

    outs = plot_training_stats(str(sp), str(tmp_path / "plots"))
    assert len(outs) == 4
    assert all(os.path.getsize(o) > 1000 for o in outs)


def test_plot_eval_sweep(tmp_path):
    """The eval-ckpts plot renders measured + filename curves and survives
    marker checkpoints with no filename accuracy."""
    from roomnet_tpu.plotting.plotter import plot_eval_sweep

    result = {
        "checkpoints": [
            {"step": 10, "name_accuracy": 0.5, "accuracy": 0.4},
            {"step": 20, "name_accuracy": None, "accuracy": 0.9},
            {"step": 30, "name_accuracy": 0.8, "accuracy": 0.7},
        ],
        "best": {"step": 20, "accuracy": 0.9},
    }
    out = plot_eval_sweep(result, str(tmp_path / "sweep.png"))
    assert os.path.getsize(out) > 1000
    # all-marker sweeps (no filename accuracies at all) still plot
    for e in result["checkpoints"]:
        e["name_accuracy"] = None
    out2 = plot_eval_sweep(result, str(tmp_path / "sweep2.png"))
    assert os.path.getsize(out2) > 1000


def test_plot_checkpoint_accuracies(tmp_path):
    for acc, step in [("0.5", 10), ("0.8", 30), ("0.7", 20)]:
        (tmp_path / f"roomnet--{acc}--{step}.npz").write_bytes(b"x")
    from roomnet_tpu.plotting.plotter import plot_checkpoint_accuracies

    out = plot_checkpoint_accuracies(str(tmp_path))
    assert os.path.exists(out)


def test_labeler_resume_and_binning(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        cv2.imwrite(str(d / f"im{i}.png"), np.zeros((8, 8, 3), np.uint8))

    from roomnet_tpu.data.labeler import ImageLabeler

    keys = iter([ord("a"), ord("b"), ord("a")])
    lab = ImageLabeler(str(d), ui=lambda p: next(keys))
    assert lab.run_labeller() == 3
    out = tmp_path / "imgs-labelled"
    assert (out / "labels.csv").exists()
    binned_a = os.listdir(out / "binned_files" / str(ord("a")))
    assert len(binned_a) == 2
    # resume: nothing left to label, no UI calls made
    lab2 = ImageLabeler(str(d), ui=lambda p: (_ for _ in ()).throw(AssertionError))
    assert lab2.run_labeller() == 0


def test_labeler_comma_filename_resumes(tmp_path):
    """Filenames containing commas are csv-quoted in labels.csv, so a
    restarted session recognizes them as done instead of re-prompting
    (and duplicating rows) forever."""
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "imgs"
    d.mkdir()
    cv2.imwrite(str(d / "room,1.png"), np.zeros((8, 8, 3), np.uint8))
    from roomnet_tpu.data.labeler import ImageLabeler

    lab = ImageLabeler(str(d), ui=lambda p: ord("a"))
    assert lab.run_labeller() == 1
    lab2 = ImageLabeler(str(d), ui=lambda p: (_ for _ in ()).throw(AssertionError))
    assert lab2.run_labeller() == 0
    assert lab2.extract_existing_labels() == ["room,1.png"]


def test_labeler_stdin_ui_whitespace_reprompts(monkeypatch):
    """Space+Enter over ssh must re-prompt (-1), not crash on resp[0]."""
    from roomnet_tpu.data import labeler

    monkeypatch.setattr("builtins.input", lambda *_: "  ")
    assert labeler._stdin_ui("x.png") == -1
    monkeypatch.setattr("builtins.input", lambda *_: " q ")
    assert labeler._stdin_ui("x.png") == labeler.ESC


def test_labeler_esc_aborts(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"im{i}.png"), np.zeros((8, 8, 3), np.uint8))
    from roomnet_tpu.data.labeler import ESC, ImageLabeler

    keys = iter([ord("x"), ESC])
    lab = ImageLabeler(str(d), ui=lambda p: next(keys))
    assert lab.run_labeller() == 1  # labeled one, then aborted


def test_device_prefetch_util():
    from roomnet_tpu.data.loader import device_prefetch

    batches = [(np.full((2, 4), i, np.uint8), np.full((2,), i, np.int32)) for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])
        np.testing.assert_array_equal(np.asarray(y), batches[i][1])


def test_profiler_trace_capture(tmp_path):
    from roomnet_tpu.utils import profiling

    import jax.numpy as jnp

    with profiling.trace_to(str(tmp_path / "trace")):
        _ = jnp.sum(jnp.ones((16, 16))).block_until_ready()
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "no trace files written"


def test_event_log(tmp_path):
    from roomnet_tpu.utils.logging import EventLog

    log = EventLog(str(tmp_path / "events.jsonl"))
    log.emit("step", loss=1.5, step=3)
    log.emit("val", accuracy=0.9)
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert lines[0]["kind"] == "step" and lines[0]["loss"] == 1.5
    assert lines[1]["accuracy"] == 0.9
    EventLog(None).emit("noop")  # disabled sink is a no-op


def test_plotter_handles_reference_ragged_stats(tmp_path):
    """The reference's committed all_train_stats.json mixes 4/6/67-class
    entries; our plotter must render all 4 PNGs from it (the reference's own
    plotter crashes on its own data under modern numpy)."""
    import os

    src = "/root/reference/all_train_stats.json"
    if not os.path.exists(src):
        pytest.skip("reference stats unavailable")
    from roomnet_tpu.plotting.plotter import plot_training_stats

    outs = plot_training_stats(src, str(tmp_path / "plots"))
    assert len(outs) == 4 and all(os.path.getsize(o) > 10_000 for o in outs)


def test_registry_all_configs_forward(tmp_path):
    """Every registered variant's forward executes (tiny batch) — except the
    224/300/600 full models which are compile-heavy; those get geometry
    validation only."""
    import jax

    from roomnet_tpu.models import registry
    from roomnet_tpu.models.roomnet import forward, init_variables

    for name in registry.names():
        cfg = registry.get(name)
        registry.validate(cfg)
        if cfg.im_side > 64:
            continue  # geometry validated; execution covered by goldens
        v = init_variables(jax.random.PRNGKey(0), cfg)
        out = forward(v, np.zeros((2, cfg.im_side, cfg.im_side, 3), np.float32), cfg)
        assert out.shape == (2, cfg.num_classes)
