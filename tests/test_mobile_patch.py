"""L7 mobile story as verifiable files (round-3 review item, deepened in
round 5): the repo vendors the PATCHED stock TFLite demo tree at
mobile/tf_image_classifier (see its VENDORED.md for provenance), so the
in-repo tree is verified directly — no external checkout, no skip. The
committed .patch + apply script remain the artifact for users patching
their own upstream checkout, and are additionally test-applied against
the reference's vendored stock tree when that happens to be present."""

import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
MOBILE = os.path.join(HERE, "..", "mobile")
VENDORED = os.path.join(MOBILE, "tf_image_classifier")
STOCK_DEMO = "/root/reference/mobile/tf_image_classifier"
TFLITE_PKG = "app/src/main/java/org/tensorflow/lite/examples/classification/tflite"


def _assert_tree_patched(demo_tree):
    """The RoomNet wiring every patched tree must carry."""
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


def _run_apply(demo):
    return subprocess.run(
        ["sh", os.path.join(MOBILE, "apply_patch.sh"), demo],
        capture_output=True, text=True,
    )


# ---- the vendored in-repo tree: verified unconditionally ----------------


def test_vendored_tree_is_patched_and_self_contained():
    """mobile/tf_image_classifier ships pre-patched with assets staged —
    a user builds the APK from this repo alone (round-4 review item #3:
    the patch previously only applied to a tree OUTSIDE the repo)."""
    _assert_tree_patched(VENDORED)
    # buildable skeleton is intact (SDK itself isn't in this container)
    for f in ("build.gradle", "settings.gradle", "gradlew",
              "app/build.gradle", "app/src/main/AndroidManifest.xml"):
        assert os.path.exists(os.path.join(VENDORED, f)), f
    # vendored model assets are byte-identical to the canonical exports
    for f in ("roomnet.tflite", "roomnet_dynamic.tflite", "labels.txt"):
        a = open(os.path.join(MOBILE, f), "rb").read()
        b = open(os.path.join(
            VENDORED, "app", "src", "main", "assets", f), "rb").read()
        assert a == b, f


def test_apply_patch_is_idempotent_on_vendored_tree(tmp_path):
    """Re-running the apply script on the already-patched vendored tree is
    a no-op (guards users who point it at this repo's own copy)."""
    dst = str(tmp_path / "demo")
    shutil.copytree(VENDORED, dst)
    subprocess.run(["chmod", "-R", "u+w", dst], check=True)
    r = _run_apply(dst)
    assert r.returncode == 0
    assert "already patched" in r.stdout


def test_patch_rejects_non_demo_dir(tmp_path):
    r = _run_apply(str(tmp_path))
    assert r.returncode != 0
    assert "does not look like" in r.stderr


# ---- the .patch against a STOCK tree (needs the reference checkout) -----


@pytest.fixture()
def stock_tree(tmp_path):
    if not os.path.isdir(STOCK_DEMO):
        pytest.skip("stock (unpatched) demo checkout not available")
    dst = str(tmp_path / "demo")
    shutil.copytree(STOCK_DEMO, dst)
    subprocess.run(["chmod", "-R", "u+w", dst], check=True)
    return dst


def test_patch_applies_to_stock_tree(stock_tree):
    r = _run_apply(stock_tree)
    assert r.returncode == 0, r.stdout + r.stderr
    _assert_tree_patched(stock_tree)


def test_patched_stock_tree_matches_vendored_sources(stock_tree):
    """stock + roomnet_demo.patch == the vendored tree, file for file (the
    two distribution channels cannot drift)."""
    assert _run_apply(stock_tree).returncode == 0
    for rel in (
        "app/build.gradle",
        f"{TFLITE_PKG}/ClassifierFloatMobileNet.java",
        f"{TFLITE_PKG}/ClassifierQuantizedMobileNet.java",
    ):
        patched = open(os.path.join(stock_tree, rel)).read()
        vendored = open(os.path.join(VENDORED, rel)).read()
        assert patched == vendored, rel
