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


def test_fvd_sweep_clip_length_driver():
    """Parity with `fvd_utils/calculate_fvd.py:16-65`: clip lengths from
    `per_frame` stepping by `per_frame`, entries below 10 frames skipped,
    optional 'final' full-length entry, greyscale channel-tripled, each
    entry equal to a direct fvd_score on the clip prefix."""
    from diffcodec_tpu.eval.frechet import fvd_sweep

    # cheap deterministic feature fn: per-video mean/std stats (shape-only
    # dependence on T, so clip prefixes give distinct features)
    def feature_fn(videos):
        v = videos.reshape(videos.shape[0], -1)
        return np.stack([v.mean(1), v.std(1), v[:, ::7][:, :16].mean(1),
                         (v ** 2).mean(1)], axis=1)

    rng = np.random.default_rng(0)
    v1 = rng.random((6, 22, 8, 8, 3)).astype(np.float32)
    v2 = rng.random((6, 22, 8, 8, 3)).astype(np.float32)
    out = fvd_sweep(v1, v2, feature_fn, calculate_per_frame=5,
                    calculate_final=True)
    # range(5, 23, 5) = 5,10,15,20 -> 5 skipped (<10)
    assert sorted(out["fvd"]) == sorted(["[:10]", "[:15]", "[:20]", "final"])
    assert out["fvd_per_frame"] == 5
    assert out["fvd_video_setting"] == (6, 22, 8, 8, 3)
    np.testing.assert_allclose(out["fvd"]["[:15]"],
                               fvd_score(v1[:, :15], v2[:, :15], feature_fn))
    np.testing.assert_allclose(out["fvd"]["final"],
                               fvd_score(v1, v2, feature_fn))

    # greyscale input is channel-tripled (calculate_fvd.py:6-14)
    g1, g2 = v1[..., :1], v2[..., :1]
    out_g = fvd_sweep(g1, g2, feature_fn, calculate_per_frame=10,
                      calculate_final=False)
    t1 = np.repeat(g1, 3, axis=-1)
    t2 = np.repeat(g2, 3, axis=-1)
    np.testing.assert_allclose(out_g["fvd"]["[:10]"],
                               fvd_score(t1[:, :10], t2[:, :10], feature_fn))

    with pytest.raises(ValueError):
        fvd_sweep(v1, v2[:3], feature_fn)
