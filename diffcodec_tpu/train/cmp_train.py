"""CMP training infrastructure: losses, LR schedule, samplers, train step.

Parity targets (`cmp/`):
  * DiscreteLoss (quantized-bin flow CE):       `cmp/losses.py:69-88`
  * EdgeAwareLoss (Sobel smooth-L1 on flow):    `cmp/losses.py:15-60`+
  * Step LR with multi-segment warmup:          `cmp/utils/scheduler.py:1-102`
    (config: lr 0.1 SGD, lr_steps [24000, 36000], lr_mults [0.1, 0.1])
  * DistributedSequentialSampler (padded even split):
                                                `cmp/utils/distributed_utils.py:113-134`
  * DistributedGivenIterationSampler (seed-0 global shuffle, rank slice,
    resume via last_iter):                      `distributed_utils.py:176-227`
  * train step with world-size-scaled loss + gradient averaging
    (`cmp/models/cmp.py:57-64`) — on TPU the mean over the data axis is an
    XLA psum from sharding, no manual all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffcodec_tpu.ops.flow import resize_bilinear


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def quantize_flow(target: jnp.ndarray, nbins: int = 99,
                  fmax: float = 50.0) -> jnp.ndarray:
    """[B,H,W,2] flow -> int32 bin indices (`cmp/losses.py:76-79`)."""
    step = 2 * fmax / float(nbins)
    t = jnp.clip(target, -fmax + 1e-3, fmax - 1e-3)
    return jnp.floor((t + fmax) / step).astype(jnp.int32)


def discrete_flow_loss(logits: jnp.ndarray, target_flow: jnp.ndarray,
                       nbins: int = 99, fmax: float = 50.0) -> jnp.ndarray:
    """CE over per-axis flow bins.  logits [B,H,W,2*nbins];
    target_flow [B,H,W,2] (`cmp/losses.py:85-88`)."""
    q = quantize_flow(target_flow, nbins, fmax)
    lx = jax.nn.log_softmax(logits[..., :nbins], axis=-1)
    ly = jax.nn.log_softmax(logits[..., nbins:], axis=-1)
    ce_x = -jnp.take_along_axis(lx, q[..., 0:1], axis=-1)
    ce_y = -jnp.take_along_axis(ly, q[..., 1:2], axis=-1)
    return jnp.mean(ce_x) + jnp.mean(ce_y)


def _flow_edge(flow: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-channel Sobel magnitude averaged over channels
    (`cmp/losses.py:50-56`)."""
    from diffcodec_tpu.ops.sobel import sobel_magnitude
    mag = sobel_magnitude(flow, eps=eps)
    return jnp.mean(mag, axis=-1, keepdims=True)


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def edge_aware_loss(pred_flow: jnp.ndarray,
                    target_flow: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 between Sobel edge maps of predicted and target flow,
    pred upsampled to target size first (`cmp/losses.py:58-60`+)."""
    th, tw = target_flow.shape[1:3]
    if pred_flow.shape[1:3] != (th, tw):
        pred_flow = resize_bilinear(pred_flow, th, tw, align_corners=True)
    return smooth_l1(_flow_edge(pred_flow), _flow_edge(target_flow))


# ---------------------------------------------------------------------------
# LR schedule
# ---------------------------------------------------------------------------

def cmp_lr_schedule(base_lr: float, lr_steps: Sequence[int],
                    lr_mults: Sequence[float],
                    warmup_lr: Sequence[float] = (),
                    warmup_steps: Sequence[int] = ()):
    """Step decay with optional piecewise-linear warmup segments.

    Matches `StepLRScheduler` semantics: lr = base_lr * prod(mults for
    steps passed); before that, warmup linearly through the
    (warmup_steps[i], warmup_lr[i]) knots.
    """
    lr_steps = list(lr_steps)
    lr_mults = list(lr_mults)
    warmup_lr = list(warmup_lr)
    warmup_steps = list(warmup_steps)
    assert len(lr_steps) == len(lr_mults)
    assert len(warmup_lr) == len(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        for s, m in zip(lr_steps, lr_mults):
            lr = jnp.where(step >= s, lr * m, lr)
        if warmup_steps:
            # piecewise-linear from base_lr through the warmup knots
            knots_x = [0.0] + [float(s) for s in warmup_steps]
            knots_y = [base_lr] + [float(v) for v in warmup_lr]
            wlr = jnp.asarray(knots_y[-1], jnp.float32)
            for i in range(len(knots_x) - 1):
                x0, x1 = knots_x[i], knots_x[i + 1]
                y0, y1 = knots_y[i], knots_y[i + 1]
                seg = y0 + (step - x0) / max(x1 - x0, 1.0) * (y1 - y0)
                wlr = jnp.where((step >= x0) & (step < x1), seg, wlr)
            in_warmup = step < warmup_steps[-1]
            lr = jnp.where(in_warmup, wlr, lr)
        return lr

    return schedule


def make_cmp_optimizer(base_lr: float = 0.1,
                       lr_steps: Sequence[int] = (24000, 36000),
                       lr_mults: Sequence[float] = (0.1, 0.1),
                       momentum: float = 0.9,
                       weight_decay: float = 1e-4):
    """SGD+momentum with the reference config's step schedule."""
    sched = cmp_lr_schedule(base_lr, lr_steps, lr_mults)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=momentum),
    )


# ---------------------------------------------------------------------------
# deterministic distributed samplers (host-side index generators)
# ---------------------------------------------------------------------------

def distributed_sequential_indices(n: int, world_size: int,
                                   rank: int) -> np.ndarray:
    """Padded even split, sequential (`distributed_utils.py:113-134`)."""
    per_rank = -(-n // world_size)
    padded = np.arange(per_rank * world_size) % n
    return padded[rank * per_rank:(rank + 1) * per_rank]


def distributed_given_iteration_indices(n: int, total_iter: int,
                                        batch_size: int, world_size: int,
                                        rank: int,
                                        last_iter: int = -1) -> np.ndarray:
    """Seed-0 global shuffle, rank slice, resume from last_iter
    (`distributed_utils.py:176-227` exact semantics incl. np.random.seed(0)
    legacy RNG)."""
    total_size = total_iter * batch_size
    all_size = total_size * world_size
    indices = np.arange(n)[:all_size]
    num_repeat = (all_size - 1) // indices.shape[0] + 1
    indices = np.tile(indices, num_repeat)[:all_size]
    rs = np.random.RandomState(0)
    rs.shuffle(indices)
    beg = total_size * rank
    indices = indices[beg:beg + total_size]
    return indices[(last_iter + 1) * batch_size:]


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CMPTrainer:
    """Bundles the CMP model into a jittable train step (DiscreteLoss,
    `cmp/models/cmp.py:57-64` step semantics; the world-size loss scaling +
    manual all-reduce is replaced by XLA's mean over the sharded batch)."""
    model: object
    nbins: int = 99
    fmax: float = 50.0

    def loss_fn(self, params, batch_stats, batch):
        """batch: {'image' [B,H,W,3], 'sparse' [B,H,W,4] (flow+mask),
        'flow_target' [B,H,W,2]}.

        The flownet decoder returns logits at 4 scales (finest first);
        its loss is the mean of the per-scale DiscreteLoss against the
        bilinearly-downsampled target (each scale supervised the same
        way the single-scale decoders are)."""
        logits, new_state = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], batch["sparse"], True,
            mutable=["batch_stats"], method=self.model.logits)
        scales = logits if isinstance(logits, (list, tuple)) else [logits]
        loss = sum(
            discrete_flow_loss(lg, _downsample_target(
                batch["flow_target"], lg.shape[1], lg.shape[2]),
                self.nbins, self.fmax)
            for lg in scales) / len(scales)
        return loss, new_state["batch_stats"]

    def train_step(self, params, batch_stats, opt_state, tx, batch):
        (loss, new_bs), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss


def _downsample_target(flow, h, w):
    if flow.shape[1] != h or flow.shape[2] != w:
        return resize_bilinear(flow, h, w, align_corners=True)
    return flow
