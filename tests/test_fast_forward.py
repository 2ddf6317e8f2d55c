"""Inference fast path: folded_forward parity and the fused decoder kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import echoflow.ops.pallas.decoder_kernel as DK


@pytest.fixture(scope="module")
def tiny_folded():
    from echoflow.models.fold_bn import fold_variables
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

    variables = init_variables(jax.random.PRNGKey(0), R2Plus1DMotionSegNet(),
                               (1, 3, 8, 32, 32))
    return fold_variables(variables)


def _rand_projs(rng, specs, c=16):
    return [jnp.asarray(rng.randn(2, 4, h, w, c).astype(np.float32) * 0.2)
            for h, w in specs]


def _rand_weights(rng, c=16, c2=16):
    return dict(
        b1=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(c, c2).astype(np.float32) * 0.3),
        b2=jnp.asarray(rng.randn(c2).astype(np.float32) * 0.1),
        ws=jnp.asarray(rng.randn(c2, 2).astype(np.float32) * 0.3),
        bs=jnp.asarray(rng.randn(2).astype(np.float32) * 0.1),
        wm=jnp.asarray(rng.randn(c2, 4).astype(np.float32) * 0.3),
        bm=jnp.asarray(rng.randn(4).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("specs", [((16, 16), (8, 8), (4, 4)),
                                   ((32, 32), (16, 16), (8, 8), (4, 4))])
def test_fused_kernel_matches_xla_reference(specs):
    rng = np.random.RandomState(0)
    projs = _rand_projs(rng, specs)
    w = _rand_weights(rng)
    DK.set_interpret_mode(True)
    try:
        seg, mot = DK.fused_decoder_heads(projs, **w, out_hw=(32, 32))
    finally:
        DK.set_interpret_mode(False)
    rseg, rmot = DK.xla_reference_decoder_heads(
        projs, w["b1"], w["w2"], w["b2"], w["ws"], w["bs"], w["wm"], w["bm"],
        out_hw=(32, 32))
    # bf16 source rounding inside the kernel (documented fast-path
    # precision) bounds the deviation at the bf16 epsilon scale.
    np.testing.assert_allclose(np.asarray(seg), np.asarray(rseg),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(mot), np.asarray(rmot),
                               rtol=0.05, atol=0.05)


def test_fused_kernel_no_motion():
    rng = np.random.RandomState(1)
    projs = _rand_projs(rng, ((16, 16), (8, 8)))
    w = _rand_weights(rng)
    DK.set_interpret_mode(True)
    try:
        seg, mot = DK.fused_decoder_heads(
            projs, w["b1"], w["w2"], w["b2"], w["ws"], w["bs"],
            out_hw=(32, 32), with_motion=False)
    finally:
        DK.set_interpret_mode(False)
    assert mot is None
    assert seg.shape == (2, 4, 32, 32, 2)


@pytest.mark.slow
def test_folded_forward_xla_matches_flax(tiny_folded):
    from echoflow.models.fast_forward import folded_forward
    from echoflow.models.r2plus1d import R2Plus1DMotionSegNet

    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 8, 32, 32).astype(np.float32))
    seg_ref, mot_ref = R2Plus1DMotionSegNet(folded=True).apply(
        tiny_folded, x, train=False)
    seg, mot = folded_forward(tiny_folded, x, pallas=False)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_ref))
    np.testing.assert_array_equal(np.asarray(mot), np.asarray(mot_ref))


@pytest.mark.slow
def test_engine_xla_decoder_matches_model_decoder(tiny_folded):
    from echoflow.infer.pipeline import VideoSegmenter

    video = np.random.RandomState(2).rand(3, 45, 32, 32).astype(np.float32)
    # Note: VideoSegmenter folds itself; hand it unfolded-style variables
    # is not needed — folded variables simply skip the fold step.
    a = VideoSegmenter(dict(tiny_folded), decoder="xla").segment_video(video)
    b = VideoSegmenter(dict(tiny_folded), decoder="model").segment_video(video)
    np.testing.assert_array_equal(a, b)
