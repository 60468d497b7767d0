"""InceptionI3D (FVD feature extractor) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.eval.frechet import fvd_score, make_i3d_feature_fn
from diffcodec_tpu.models.hf_import import convert_state_dict, \
    export_state_dict
from diffcodec_tpu.models.i3d import (InceptionI3D, i3d_batch_stats_map,
                                      i3d_name_map)


@pytest.fixture(scope="module")
def tiny_i3d():
    model = InceptionI3D(num_classes=400)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 64, 64, 3)))
    return model, variables

@pytest.mark.slow
def test_i3d_output_shape(tiny_i3d):
    model, variables = tiny_i3d
    out = model.apply(variables, jnp.zeros((2, 16, 64, 64, 3)))
    assert out.shape == (2, 400)
    assert np.isfinite(np.asarray(out)).all()


def test_i3d_name_map_coverage_and_roundtrip(tiny_i3d):
    model, variables = tiny_i3d
    pm = i3d_name_map()
    bm = i3d_batch_stats_map()
    flax_paths = {
        tuple(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    mapped = {("params",) + f for _, f, _ in pm} | \
        {("batch_stats",) + f for _, f, _ in bm}
    assert flax_paths == mapped
    # roundtrip the params collection
    sd = export_state_dict(variables["params"], pm)
    assert sd["Conv3d_1a_7x7.conv3d.weight"].shape == (64, 3, 7, 7, 7)
    converted, missing, unused = convert_state_dict(
        sd, pm, variables["params"])
    assert not missing and not unused
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(converted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fvd_with_flax_i3d_features(tiny_i3d):
    _, variables = tiny_i3d
    fn = make_i3d_feature_fn(variables, batch_size=2)
    rng = np.random.default_rng(0)
    v1 = rng.random((4, 16, 64, 64, 3)).astype(np.float32)
    v2 = rng.random((4, 16, 64, 64, 3)).astype(np.float32)
    d_same = fvd_score(v1, v1, fn)
    d_diff = fvd_score(v1, np.clip(v2 * 0.2, 0, 1), fn)
    assert abs(d_same) < 1e-6
    assert d_diff > 0
