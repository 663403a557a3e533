"""Analytic roofline model (utils/roofline.py): geometry-exact FLOPs that
bench.py turns into machine-readable utilization fields."""

import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG
from roomnet_tpu.utils.roofline import forward_groups, summarize


def test_b2_conv_flops_match_perf_measurement():
    """PERF.md roofline: each interior B2 conv is ~214 GFLOP at batch 256
    (2 * out_elems * 9 * Cin). The model must reproduce that number."""
    groups = {g.name: g for g in forward_groups(DEFAULT_CONFIG, 256)}
    assert abs(groups["b2.conv1"].flops / 1e9 - 214) < 2


def test_summary_fields_and_consistency():
    s = summarize(DEFAULT_CONFIG, 256, measured_s=0.0337)
    assert s["total_gflops"] > 1000  # ~1.5 TFLOP forward at batch 256
    assert 0.0 < s["hbm_bound_time_fraction"] <= 1.0
    assert s["ideal_ms"] < s["measured_ms"]  # a lower bound by construction
    assert 0 < s["pct_bf16_roofline"] < 100
    assert 0 < s["pct_of_ideal"] < 100
    # achieved = flops / time, internally consistent
    np.testing.assert_allclose(
        s["achieved_tflops"], s["total_gflops"] / 1e3 / 0.0337, rtol=1e-6
    )


def test_scales_linearly_with_batch():
    a = summarize(DEFAULT_CONFIG, 128)
    b = summarize(DEFAULT_CONFIG, 256)
    # conv/pool terms scale with batch; dense weight-read bytes do not —
    # allow 1% slack
    np.testing.assert_allclose(2 * a["total_gflops"], b["total_gflops"],
                               rtol=0.01)
    np.testing.assert_allclose(2 * a["total_hbm_GB"], b["total_hbm_GB"],
                               rtol=0.01)
