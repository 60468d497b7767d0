"""InceptionV3 FID-64 prefix tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.eval.frechet import fid_score
from diffcodec_tpu.eval.inception import (InceptionFID64,
                                          inception64_batch_stats_map,
                                          inception64_name_map,
                                          make_fid64_feature_fn)
from diffcodec_tpu.models.hf_import import convert_state_dict, \
    export_state_dict


@pytest.fixture(scope="module")
def fid_model():
    model = InceptionFID64()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3)))
    return model, variables


def test_fid64_shapes(fid_model):
    model, variables = fid_model
    out = model.apply(variables, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 64)


def test_fid64_name_map_roundtrip(fid_model):
    model, variables = fid_model
    pm = inception64_name_map()
    bm = inception64_batch_stats_map()
    flax_paths = {
        tuple(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    mapped = {("params",) + f for _, f, _ in pm} | \
        {("batch_stats",) + f for _, f, _ in bm}
    assert flax_paths == mapped
    sd = export_state_dict(variables["params"], pm)
    assert sd["Conv2d_1a_3x3.conv.weight"].shape == (32, 3, 3, 3)
    converted, missing, unused = convert_state_dict(sd, pm,
                                                    variables["params"])
    assert not missing and not unused


def test_fid_pipeline_with_flax_features(fid_model):
    _, variables = fid_model
    fn = make_fid64_feature_fn(variables, batch_size=4)
    rng = np.random.default_rng(0)
    a = (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8)
    b = (rng.random((8, 64, 64, 3)) * 120).astype(np.uint8)
    assert abs(fid_score(a, a, fn)) < 1e-6
    assert fid_score(a, b, fn) > 0
