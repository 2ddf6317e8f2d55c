"""Weight-converter + full-model forward parity vs a torch replica.

torchvision is not installed here, so the test builds a faithful torch
replica of the reference model (topology documented in SURVEY.md §2 and
tests' own midplanes math) with torchvision-compatible state-dict keys,
randomizes every parameter *and* BN running stat, converts the state dict,
and compares full forward passes (eval mode) between torch and flax. This
covers: OIDHW->DHWIO layouts, BN scale/bias/mean/var wiring, stem/block
topology, and the decomposed comb1 decoder equivalence (sum of per-tap
projections == conv on concat).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from echoflow.models.convert import (
    assert_tree_matches_model,
    convert_kinetics_backbone,
    convert_state_dict,
)
from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables, midplanes

# Full-model CPU compiles: minutes on this 1-core host (see pytest.ini).
pytestmark = pytest.mark.slow



def _c2p1(i, o, mid, stride=1):
    return nn.Sequential(
        nn.Conv3d(i, mid, (1, 3, 3), (1, stride, stride), (0, 1, 1), bias=False),
        nn.BatchNorm3d(mid),
        nn.ReLU(),
        nn.Conv3d(mid, o, (3, 1, 1), (stride, 1, 1), (1, 0, 0), bias=False),
    )


class _Block(nn.Module):
    def __init__(self, i, o, stride=1):
        super().__init__()
        mid = midplanes(i, o)
        self.conv1 = nn.Sequential(_c2p1(i, o, mid, stride), nn.BatchNorm3d(o), nn.ReLU())
        self.conv2 = nn.Sequential(_c2p1(o, o, mid), nn.BatchNorm3d(o))
        self.downsample = (
            nn.Sequential(nn.Conv3d(i, o, 1, (stride,) * 3, bias=False), nn.BatchNorm3d(o))
            if (stride != 1 or i != o)
            else None
        )
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x) if self.downsample is not None else x
        return self.relu(self.conv2(self.conv1(x)) + idt)


class _Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            nn.BatchNorm3d(45),
            nn.ReLU(),
            nn.Conv3d(45, 64, (3, 1, 1), 1, (1, 0, 0), bias=False),
            nn.BatchNorm3d(64),
            nn.ReLU(),
        )
        self.layer1 = nn.Sequential(_Block(64, 64), _Block(64, 64))
        self.layer2 = nn.Sequential(_Block(64, 128, 2), _Block(128, 128))
        self.layer3 = nn.Sequential(_Block(128, 256, 2), _Block(256, 256))
        self.layer4 = nn.Sequential(_Block(256, 512, 2), _Block(512, 512))
        self.fc = nn.Linear(512, 400)


class _TorchMotionNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.r2plus1d_model = _Backbone()
        self.comb_1_layer = nn.Conv3d(1024, 64, 1)
        self.comb_batch_norm_1 = nn.BatchNorm3d(64)
        self.comb_2_layer = nn.Conv3d(64, 64, 1)
        self.comb_batch_norm_2 = nn.BatchNorm3d(64)
        self.motion_head = nn.Conv3d(64, 4, 1)
        self.segmentation_head = nn.Conv3d(64, 2, 1)

    def forward(self, x):
        b = self.r2plus1d_model
        stem = b.stem(x)
        l1 = b.layer1(stem)
        l2 = b.layer2(l1)
        l3 = b.layer3(l2)
        l4 = b.layer4(l3)
        size = x.shape[2:]
        ups = [
            F.interpolate(t, size=size, mode="trilinear", align_corners=True)
            for t in (stem, l1, l2, l3, l4)
        ]
        y = torch.cat(ups, 1)
        y = F.relu(self.comb_batch_norm_1(self.comb_1_layer(y)))
        y = F.relu(self.comb_batch_norm_2(self.comb_2_layer(y)))
        return self.segmentation_head(y), torch.tanh(self.motion_head(y))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = _TorchMotionNet()
    # Randomize BN running stats so mean/var wiring mistakes can't hide.
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.7, 1.4)
    model.eval()
    return model


def test_converted_tree_structure(torch_model):
    state = {f"module.{k}": v for k, v in torch_model.state_dict().items()}
    converted = convert_state_dict(state)
    flax_model = R2Plus1DMotionSegNet()
    ref_vars = init_variables(jax.random.PRNGKey(0), flax_model, (1, 3, 8, 16, 16))
    assert_tree_matches_model(converted, jax.tree.map(np.asarray, ref_vars))


def test_full_forward_parity(torch_model):
    state = {f"module.{k}": v for k, v in torch_model.state_dict().items()}
    converted = convert_state_dict(state)
    converted = jax.tree.map(jnp.asarray, converted)

    x = np.random.RandomState(0).rand(1, 3, 8, 32, 32).astype(np.float32)
    with torch.no_grad():
        seg_t, mot_t = torch_model(torch.from_numpy(x))

    flax_model = R2Plus1DMotionSegNet()
    # Pin full matmul/conv precision: the environment's default is reduced
    # (bf16-like) even on CPU, which costs ~1e-2 relative drift over 18
    # layers — precision noise, not a wiring bug.
    with jax.default_matmul_precision("highest"):
        seg_j, mot_j = flax_model.apply(converted, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(seg_j), seg_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mot_j), mot_t.numpy(), rtol=1e-3, atol=1e-4)


def test_unknown_key_raises(torch_model):
    with pytest.raises(KeyError):
        convert_state_dict({"module.not_a_real_layer.weight": np.zeros((1,))})


# --------------------------------------------------------------------------
# Kinetics-pretrained backbone initialization (the reference training recipe
# constructs r2plus1d_18(pretrained=True) — R2plus1D_18_MotionNet.py:13 —
# so fine-tuning starts from a STOCK torchvision Kinetics-400 state dict:
# no module. prefix, no decoder/head keys, heads fresh).

@pytest.fixture(scope="module")
def kinetics_state_dict():
    torch.manual_seed(1)
    backbone = _Backbone()
    with torch.no_grad():
        for mod in backbone.modules():
            if isinstance(mod, nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.7, 1.4)
    return {k: v.numpy() for k, v in backbone.state_dict().items()}


@pytest.fixture(scope="module")
def fresh_variables():
    flax_model = R2Plus1DMotionSegNet()
    return jax.tree.map(
        np.asarray, init_variables(jax.random.PRNGKey(3), flax_model, (1, 3, 8, 16, 16)))


def test_kinetics_backbone_graft(kinetics_state_dict, fresh_variables):
    grafted = convert_kinetics_backbone(kinetics_state_dict, fresh_variables)
    sd, base = kinetics_state_dict, fresh_variables

    # Backbone weights come from the checkpoint, layout-converted.
    want_stem = np.transpose(sd["stem.0.weight"], (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(
        grafted["params"]["backbone"]["stem_conv_s"]["kernel"], want_stem)
    want_l3 = np.transpose(sd["layer3.1.conv2.0.3.weight"], (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(
        grafted["params"]["backbone"]["layer3_block1"]["conv2"]["temporal"]["kernel"],
        want_l3)
    np.testing.assert_array_equal(
        grafted["batch_stats"]["backbone"]["stem_bn_s"]["mean"],
        sd["stem.1.running_mean"])
    # The dead Kinetics fc head is grafted too (it IS part of the stock dict).
    np.testing.assert_array_equal(grafted["params"]["fc_kernel"], sd["fc.weight"].T)
    # Decoder/heads stay exactly the fresh init.
    np.testing.assert_array_equal(grafted["params"]["comb1_kernel"],
                                  base["params"]["comb1_kernel"])
    np.testing.assert_array_equal(grafted["params"]["seg_head"]["kernel"],
                                  base["params"]["seg_head"]["kernel"])
    np.testing.assert_array_equal(grafted["batch_stats"]["comb_bn1"]["mean"],
                                  base["batch_stats"]["comb_bn1"]["mean"])
    # The grafted tree is still structurally a valid model variable tree.
    assert_tree_matches_model(grafted, base)


def test_kinetics_rejects_reference_checkpoint_keys(kinetics_state_dict, fresh_variables):
    bad = dict(kinetics_state_dict)
    bad["comb_1_layer.weight"] = np.zeros((64, 1024, 1, 1, 1), np.float32)
    with pytest.raises(KeyError, match="non-backbone"):
        convert_kinetics_backbone(bad, fresh_variables)


def test_kinetics_rejects_partial_backbone(kinetics_state_dict, fresh_variables):
    partial = {k: v for k, v in kinetics_state_dict.items()
               if not k.startswith("layer4.1.")}
    with pytest.raises(ValueError, match="full backbone"):
        convert_kinetics_backbone(partial, fresh_variables)


def test_kinetics_rejects_shape_mismatch(kinetics_state_dict, fresh_variables):
    bad = dict(kinetics_state_dict)
    bad["fc.weight"] = np.zeros((17, 512), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_kinetics_backbone(bad, fresh_variables)
