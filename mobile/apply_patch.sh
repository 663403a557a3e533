#!/bin/sh
# Wire the RoomNet artifacts into a checkout of the stock TFLite camera
# demo (the tree the reference vendors at mobile/tf_image_classifier).
#
#   mobile/apply_patch.sh /path/to/tf_image_classifier
#
# Applies mobile/roomnet_demo.patch (float slot -> roomnet.tflite,
# "quantized" slot -> the dynamic-range roomnet_dynamic.tflite via the
# float pipeline, model auto-download disabled) and copies the model +
# label assets in. Idempotence: refuses to re-apply on an already-patched
# tree. Verified by tests/test_mobile_patch.py against the vendored tree.
set -eu

demo="${1:?usage: apply_patch.sh /path/to/tf_image_classifier}"
here="$(cd "$(dirname "$0")" && pwd)"

[ -f "$demo/app/build.gradle" ] || {
    echo "error: $demo does not look like the tf_image_classifier root" >&2
    exit 1
}
if grep -q "roomnet.tflite" \
    "$demo/app/src/main/java/org/tensorflow/lite/examples/classification/tflite/ClassifierFloatMobileNet.java"; then
    echo "already patched — nothing to do"
    exit 0
fi

patch -p1 -d "$demo" < "$here/roomnet_demo.patch"

assets="$demo/app/src/main/assets"
mkdir -p "$assets"
cp "$here/roomnet.tflite" "$assets/"
cp "$here/roomnet_dynamic.tflite" "$assets/"
cp "$here/labels.txt" "$assets/labels.txt"
echo "patched: models + labels staged in app/src/main/assets/"
