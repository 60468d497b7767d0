"""CMP YAML experiment-config loader: reference-schema parsing, model/
optimizer construction, and the pairing validation.

Schema target: `cmp/experiments/semiauto_annot/resnet50_vip+mpii_liteflow/
config.yaml` (values below reproduce that shipped config) and the
rep_learning alexnet configs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcodec_tpu.train.cmp_config import (build_cmp_model,
                                            build_cmp_optimizer,
                                            load_cmp_config,
                                            parse_cmp_config)

SHIPPED_YAML = """
model:
    arch: CMP
    total_iter: 42000
    lr_steps: [24000, 36000]
    lr_mults: [0.1, 0.1]
    lr: 0.1
    optim: SGD
    warmup_lr: []
    warmup_steps: []
    module:
        arch: CMP
        image_encoder: resnet50
        sparse_encoder: shallownet8x
        flow_decoder: MotionDecoderSkipLayer
        skip_layer: True
        img_enc_dim: 256
        sparse_enc_dim: 16
        output_dim: 198
        decoder_combo: [1,2,4]
        pretrained_image_encoder: False
        flow_criterion: "DiscreteLoss"
        nbins: 99
        fmax: 50
data:
    workers: 2
    batch_size: 8
    short_size: 416
    crop_size: [384, 384]
    sample_strategy: ['grid', 'watershed']
    sample_bg_ratio: 5.74e-5
    nms_ks: 41
    max_num_guide: -1
trainer:
    initial_val: True
    print_freq: 100
    val_freq: 5000
    save_freq: 5000
    loss_record: ['loss_flow']
    tensorboard: True
"""

ALEXNET_YAML = """
model:
    total_iter: 140000
    lr_steps: [80000, 120000]
    lr_mults: [0.1, 0.1]
    lr: 0.1
    optim: SGD
    warmup_lr: [0.4]
    warmup_steps: [10000]
    module:
        image_encoder: alexnet_fcn_32x
        sparse_encoder: shallownet32x
        flow_decoder: MotionDecoderPlain
        skip_layer: False
        img_enc_dim: 256
        sparse_enc_dim: 16
        output_dim: 198
        decoder_combo: [1]
        flow_criterion: "DiscreteLoss"
        nbins: 99
        fmax: 50
data:
    batch_size: 12
"""


@pytest.fixture
def shipped(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(SHIPPED_YAML)
    return load_cmp_config(str(p))


def test_shipped_config_parses(shipped):
    assert shipped.module.image_encoder == "resnet50"
    assert shipped.module.output_dim == 198
    assert shipped.module.decoder_combo == (1, 2, 4)
    assert shipped.schedule.total_iter == 42000
    assert shipped.schedule.lr_steps == (24000, 36000)
    assert shipped.data.crop_size == (384, 384)
    assert shipped.data.sample_strategy == ("grid", "watershed")
    assert shipped.data.sample_bg_ratio == pytest.approx(5.74e-5)
    assert shipped.trainer.val_freq == 5000
    # frozen: configs are jit-static
    with pytest.raises(dataclasses.FrozenInstanceError):
        shipped.module.nbins = 3


def test_shipped_config_builds_running_model(shipped):
    model = build_cmp_model(shipped)
    assert model.backbone == "resnet50" and model.decoder == "skip"
    img = jnp.zeros((1, 64, 64, 3))
    sparse = jnp.zeros((1, 64, 64, 4))
    variables = model.init(jax.random.PRNGKey(0), img, sparse)
    flow = model.apply(variables, img, sparse, mutable=False)
    assert flow.shape == (1, 64, 64, 2)


def test_optimizer_follows_schedule(shipped):
    import optax

    tx = build_cmp_optimizer(shipped)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    # probe the schedule through the reference knots
    from diffcodec_tpu.train.cmp_train import cmp_lr_schedule
    s = shipped.schedule
    sched = cmp_lr_schedule(s.lr, s.lr_steps, s.lr_mults)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(24000)) == pytest.approx(0.01)
    assert float(sched(36000)) == pytest.approx(0.001)
    # and the chain applies updates without error
    g = {"w": jnp.ones((3,))}
    updates, _ = tx.update(g, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_alexnet_rep_learning_config(tmp_path):
    p = tmp_path / "alex.yaml"
    p.write_text(ALEXNET_YAML)
    cfg = load_cmp_config(str(p))
    assert cfg.schedule.warmup_steps == (10000,)
    model = build_cmp_model(cfg)
    assert model.backbone == "alexnet_fcn_32x" and model.decoder == "plain"
    # warmup knots reach the schedule
    from diffcodec_tpu.train.cmp_train import cmp_lr_schedule
    s = cfg.schedule
    sched = cmp_lr_schedule(s.lr, s.lr_steps, s.lr_mults,
                            warmup_lr=s.warmup_lr,
                            warmup_steps=s.warmup_steps)
    assert float(sched(5000)) == pytest.approx(0.25, rel=1e-3)


@pytest.mark.parametrize("mutate, match", [
    ({"sparse_encoder": "shallownet32x"}, "pairs with"),
    ({"flow_decoder": "MotionDecoderBogus"}, "unknown flow_decoder"),
    ({"output_dim": 100}, "2\\*nbins"),
    ({"flow_criterion": "L1"}, "DiscreteLoss"),
])
def test_validation_rejects(mutate, match):
    import yaml

    raw = yaml.safe_load(SHIPPED_YAML)
    raw["model"]["module"].update(mutate)
    with pytest.raises(ValueError, match=match):
        parse_cmp_config(raw)


TINY_YAML = """
model:
    total_iter: 3
    lr_steps: [2]
    lr_mults: [0.1]
    lr: 0.05
    optim: SGD
    module:
        image_encoder: resnet50
        sparse_encoder: shallownet8x
        flow_decoder: MotionDecoderSkipLayer
        skip_layer: True
        img_enc_dim: 16
        sparse_enc_dim: 4
        output_dim: 18
        decoder_combo: [1,2,4]
        flow_criterion: "DiscreteLoss"
        nbins: 9
        fmax: 50
data:
    batch_size: 2
    crop_size: [64, 64]
    sample_strategy: ['grid']
    sample_bg_ratio: 0.01
    nms_ks: 5
    max_num_guide: -1
trainer:
    print_freq: 1
    val_freq: 100
    save_freq: 2
"""


@pytest.mark.slow
def test_train_cmp_cli_drill(tmp_path, capsys):
    """The YAML-driven CMP training CLI end-to-end: synthetic data, the
    config's sparse-sampling knobs, checkpoint rotation, and resume."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    mod = importlib.import_module("train_cmp")
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)
    out = str(tmp_path / "run")
    mod.main(["--config", str(cfg_path), "--output_dir", out,
              "--synthetic", "6", "--crop", "64"])
    text = capsys.readouterr().out
    assert "iter 3/3" in text and "loss_flow=" in text
    import os
    names = sorted(os.listdir(out))
    assert "checkpoint-2" in names and "checkpoint-3" in names
    # resume continues the iteration counter past the restored step
    mod.main(["--config", str(cfg_path), "--output_dir", out,
              "--synthetic", "6", "--crop", "64", "--total_iter", "5",
              "--resume", "latest"])
    text = capsys.readouterr().out
    assert "resumed from checkpoint-3" in text
    assert "iter 5/5" in text
