"""CMP training infra tests: losses, LR schedule, samplers, train step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.models.cmp import CMP
from diffcodec_tpu.train.cmp_train import (CMPTrainer, cmp_lr_schedule,
                                           discrete_flow_loss,
                                           distributed_given_iteration_indices,
                                           distributed_sequential_indices,
                                           edge_aware_loss,
                                           make_cmp_optimizer, quantize_flow)


def test_quantize_flow_bins():
    nbins, fmax = 99, 50.0
    step = 2 * fmax / nbins
    flow = jnp.asarray([[[[0.0, -50.0], [49.9, 12.3]]]])
    q = np.asarray(quantize_flow(flow, nbins, fmax))
    assert q[0, 0, 0, 0] == int((0 + fmax) / step)
    assert q[0, 0, 0, 1] == 0          # clamped to lowest bin
    assert q[0, 0, 1, 0] == nbins - 1  # top bin
    assert 0 <= q.min() and q.max() < nbins


def test_discrete_loss_perfect_prediction_low():
    nbins, fmax = 9, 50.0
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.uniform(-40, 40, (2, 4, 4, 2)).astype(np.float32))
    q = np.asarray(quantize_flow(flow, nbins, fmax))
    logits = np.full((2, 4, 4, 2 * nbins), -20.0, np.float32)
    for b in range(2):
        for i in range(4):
            for j in range(4):
                logits[b, i, j, q[b, i, j, 0]] = 20.0
                logits[b, i, j, nbins + q[b, i, j, 1]] = 20.0
    good = float(discrete_flow_loss(jnp.asarray(logits), flow, nbins, fmax))
    bad = float(discrete_flow_loss(jnp.zeros_like(jnp.asarray(logits)),
                                   flow, nbins, fmax))
    assert good < 1e-3
    assert bad > 1.0


def test_edge_aware_loss():
    flow = jnp.zeros((1, 16, 16, 2)).at[:, :, 8:].set(5.0)  # an edge
    assert float(edge_aware_loss(flow, flow)) < 1e-6
    # upsampling path: half-res prediction
    half = jnp.zeros((1, 8, 8, 2)).at[:, :, 4:].set(5.0)
    v = float(edge_aware_loss(half, flow))
    assert np.isfinite(v)
    flat = jnp.zeros_like(flow)
    assert float(edge_aware_loss(flat, flow)) > 0.01


def test_cmp_lr_schedule_steps_and_warmup():
    sched = cmp_lr_schedule(0.1, [100, 200], [0.1, 0.1])
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.001, rtol=1e-6)
    # warmup: linear from base 0.01 to 0.1 over 10 steps
    sched = cmp_lr_schedule(0.01, [100], [0.1], warmup_lr=[0.1],
                            warmup_steps=[10])
    np.testing.assert_allclose(float(sched(0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(5)), 0.055, rtol=1e-4)
    np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-5)  # post


def test_distributed_sequential_indices():
    # 10 items over 4 ranks -> 3 each, padded by wrapping
    all_idx = [distributed_sequential_indices(10, 4, r) for r in range(4)]
    assert all(len(a) == 3 for a in all_idx)
    flat = np.concatenate(all_idx)
    assert set(flat[:10].tolist()) | set(flat.tolist()) <= set(range(10))
    assert len(flat) == 12


def test_distributed_given_iteration_indices():
    a0 = distributed_given_iteration_indices(100, total_iter=5,
                                             batch_size=4, world_size=2,
                                             rank=0)
    a1 = distributed_given_iteration_indices(100, total_iter=5,
                                             batch_size=4, world_size=2,
                                             rank=1)
    assert len(a0) == 20 and len(a1) == 20
    # deterministic across calls (seed 0)
    b0 = distributed_given_iteration_indices(100, 5, 4, 2, 0)
    np.testing.assert_array_equal(a0, b0)
    # resume: last_iter=2 skips 3 batches
    r0 = distributed_given_iteration_indices(100, 5, 4, 2, 0, last_iter=2)
    np.testing.assert_array_equal(r0, a0[12:])
    # rank slices are disjoint positions of one global shuffle
    assert not np.array_equal(a0, a1)

@pytest.mark.slow
def test_cmp_train_step_runs_and_descends():
    cmp = CMP(img_enc_dim=8, sparse_enc_dim=4, nbins=9, fmax=50.0)
    B, H = 1, 64
    img = jnp.ones((B, H, H, 3)) * 0.5
    sparse = jnp.zeros((B, H, H, 4))
    variables = cmp.init(jax.random.PRNGKey(0), img, sparse)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = make_cmp_optimizer(base_lr=0.01)
    opt_state = tx.init(params)
    trainer = CMPTrainer(model=cmp, nbins=9)
    batch = {"image": img, "sparse": sparse,
             "flow_target": jnp.full((B, H, H, 2), 3.0)}
    losses = []
    for _ in range(3):
        params, batch_stats, opt_state, loss = trainer.train_step(
            params, batch_stats, opt_state, tx, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning on a constant target


@pytest.mark.slow
def test_cmp_train_step_flownet_multiscale():
    """The flownet decoder emits logits at 4 scales; the loss must
    supervise every scale (mean of per-scale DiscreteLoss) and the step
    must still descend."""
    cmp = CMP(img_enc_dim=8, sparse_enc_dim=4, nbins=9, fmax=50.0,
              decoder="flownet")
    B, H = 1, 64
    img = jnp.ones((B, H, H, 3)) * 0.5
    sparse = jnp.zeros((B, H, H, 4))
    variables = cmp.init(jax.random.PRNGKey(0), img, sparse)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # the decoder really is multi-scale here
    logits = cmp.apply(variables, img, sparse, False,
                       method=cmp.logits, mutable=False)
    assert isinstance(logits, (list, tuple)) and len(logits) == 4
    tx = make_cmp_optimizer(base_lr=0.01)
    opt_state = tx.init(params)
    trainer = CMPTrainer(model=cmp, nbins=9)
    batch = {"image": img, "sparse": sparse,
             "flow_target": jnp.full((B, H, H, 2), 3.0)}
    losses = []
    for _ in range(3):
        params, batch_stats, opt_state, loss = trainer.train_step(
            params, batch_stats, opt_state, tx, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
