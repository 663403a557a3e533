"""Reverse converter (params/export_tf.py): our flat variables -> TF1
checkpoint with reference-graph names, byte-exact round trip. The heavier
full-circle proof (restore into the reference's own meta graph, reproduce
the golden logits — measured 0.0 delta) lives in tools/verify_tf_export.py
since it needs /root/reference. TF is offline-only — skipped when absent."""

import numpy as np
import pytest

import jax

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, init_variables
from roomnet_tpu.params import schema
from roomnet_tpu.params.export_tf import export_tf_checkpoint

tf = pytest.importorskip("tensorflow")


def test_tf_checkpoint_roundtrip_byte_exact(tmp_path):
    variables = init_variables(jax.random.PRNGKey(0), DEFAULT_CONFIG)
    flat = {k: np.asarray(v) for k, v in schema.flatten_jax(variables).items()}
    prefix = str(tmp_path / "export" / "roomnet")
    path = export_tf_checkpoint(flat, prefix)

    reader = tf.train.load_checkpoint(path)
    name_map = schema.tf_name_map(DEFAULT_CONFIG)
    shape_map = reader.get_variable_to_shape_map()
    # exactly the 79 reference tensors, nothing else
    assert sorted(shape_map) == sorted(name_map.values())
    total = 0
    for our_path, tf_name in name_map.items():
        got = np.asarray(reader.get_tensor(tf_name))
        np.testing.assert_array_equal(got, flat[our_path], err_msg=tf_name)
        total += got.size
    assert total == 178_062


def test_export_rejects_incomplete_params(tmp_path):
    variables = init_variables(jax.random.PRNGKey(0), DEFAULT_CONFIG)
    flat = {k: np.asarray(v) for k, v in schema.flatten_jax(variables).items()}
    flat.pop("dense/3/bias")
    with pytest.raises(KeyError, match="dense/3/bias"):
        export_tf_checkpoint(flat, str(tmp_path / "x" / "roomnet"))
