"""A tiny RoomNet config for fast mechanics tests (CPU-compile friendly).

Same architecture family (conv blocks with residual resize, dense head with
ReLU6 logits) at a fraction of the spatial size, so train-step/BN/dropout/
sharding semantics are exercised without the 224x224 compile cost.
"""

from roomnet_tpu.models.roomnet import RoomNetConfig

TINY = RoomNetConfig(
    num_classes=4,
    im_side=32,
    block_filters=(8, 16),
    block_depths=(1, 2),
    block_pools=((3, 1), (4, 2)),
    dense_units=(16, 8),
)
# Geometry: 32 -> conv 30 -> pool3/s1 28 | B2: conv 26 -> pool4/s2 12 -> conv
# 10 -> pool 4 | residual resize 12->4 | flatten 4*4*16=256.
assert TINY.spatial_sizes() == [[28], [12, 4]], TINY.spatial_sizes()
assert TINY.flat_len == 256
