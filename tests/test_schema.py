"""Param schema properties: flatten/unflatten identity, TF name map shape."""

import jax
import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, init_variables, param_count
from roomnet_tpu.params import schema
from tests.tiny import TINY


def test_flatten_unflatten_roundtrip_tiny():
    v = init_variables(jax.random.PRNGKey(0), TINY)
    flat = schema.flatten_variables(v)
    v2 = schema.unflatten_variables(flat, TINY)
    flat2 = schema.flatten_variables(v2)
    assert set(flat) == set(flat2)
    for k in flat:
        np.testing.assert_array_equal(flat[k], flat2[k])


def test_flatten_jax_matches_flatten_variables():
    v = init_variables(jax.random.PRNGKey(1), TINY)
    a = schema.flatten_variables(v)
    b = schema.flatten_jax(v)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]))


def test_tf_name_map_is_complete_bijection():
    """79 tensors, unique TF names, numbering matches SURVEY.md §2.5."""
    m = schema.tf_name_map(DEFAULT_CONFIG)
    assert len(m) == 79
    assert len(set(m.values())) == 79
    assert m["blocks/0/conv/0"] == "conv2d/kernel"
    assert m["blocks/1/conv/2"] == "conv2d_3/kernel"
    assert m["blocks/1/res_bn/scale"] == "batch_normalization_4/gamma"
    assert m["blocks/4/res_bn/var"] == "batch_normalization_12/moving_variance"
    assert m["dense/0/bn/mean"] == "batch_normalization_13/moving_mean"
    assert m["dense/3/bias"] == "dense_3/bias"


def test_partition_flat_split():
    v = init_variables(jax.random.PRNGKey(0), TINY)
    flat = schema.flatten_jax(v)
    train, frozen = schema.partition_flat(flat)
    assert set(train) | set(frozen) == set(flat)
    assert not (set(train) & set(frozen))
    assert all(k.endswith(("/mean", "/var")) for k in frozen)
    assert sum(np.asarray(x).size for x in flat.values()) == param_count(v)
