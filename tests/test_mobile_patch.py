"""The committed mobile patch must actually apply to the stock demo tree
(round-3 review missing item #1: ship the L7 story as files + a verified
apply script, not prose). Runs against the vendored demo checkout when
present; the patch itself is the artifact under test."""

import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
MOBILE = os.path.join(HERE, "..", "mobile")
DEMO = "/root/reference/mobile/tf_image_classifier"
TFLITE_PKG = "app/src/main/java/org/tensorflow/lite/examples/classification/tflite"


@pytest.fixture()
def demo_tree(tmp_path):
    if not os.path.isdir(DEMO):
        pytest.skip("stock demo checkout not available")
    dst = str(tmp_path / "demo")
    shutil.copytree(DEMO, dst)
    subprocess.run(["chmod", "-R", "u+w", dst], check=True)
    return dst


def _run_apply(demo):
    return subprocess.run(
        ["sh", os.path.join(MOBILE, "apply_patch.sh"), demo],
        capture_output=True, text=True,
    )


def test_patch_applies_and_stages_assets(demo_tree):
    r = _run_apply(demo_tree)
    assert r.returncode == 0, r.stdout + r.stderr

    flt = open(os.path.join(demo_tree, TFLITE_PKG,
                            "ClassifierFloatMobileNet.java")).read()
    assert 'return "roomnet.tflite";' in flt
    assert "mobilenet_v1_1.0_224.tflite" not in flt

    qnt = open(os.path.join(demo_tree, TFLITE_PKG,
                            "ClassifierQuantizedMobileNet.java")).read()
    assert 'return "roomnet_dynamic.tflite";' in qnt
    # dynamic-range tflite keeps float I/O: the byte pipeline must be gone
    assert "putFloat" in qnt and "put((byte)" not in qnt
    assert "float[][] labelProbArray" in qnt
    assert "byteValue" not in qnt

    gradle = open(os.path.join(demo_tree, "app", "build.gradle")).read()
    assert "// apply from:'download.gradle'" in gradle

    assets = os.path.join(demo_tree, "app", "src", "main", "assets")
    for f in ("roomnet.tflite", "roomnet_dynamic.tflite", "labels.txt"):
        assert os.path.isfile(os.path.join(assets, f)), f
    # labels.txt is the 6-class RoomNet list, not the 1001-class stock one
    labels = open(os.path.join(assets, "labels.txt")).read().splitlines()
    assert len(labels) == 6


def test_patch_is_idempotent(demo_tree):
    assert _run_apply(demo_tree).returncode == 0
    r2 = _run_apply(demo_tree)
    assert r2.returncode == 0
    assert "already patched" in r2.stdout


def test_patch_rejects_non_demo_dir(tmp_path):
    r = _run_apply(str(tmp_path))
    assert r.returncode != 0
    assert "does not look like" in r.stderr
