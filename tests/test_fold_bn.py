"""BN folding: folded model must reproduce the unfolded eval logits."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from echoflow.models.fold_bn import fold_variables
from echoflow.models.r2plus1d import R2Plus1DMotionSegNet, init_variables

# Full-model CPU compiles: minutes on this 1-core host (see pytest.ini).
pytestmark = pytest.mark.slow



def test_folded_matches_unfolded(rng):
    model = R2Plus1DMotionSegNet()
    variables = init_variables(jax.random.PRNGKey(7), model, (1, 3, 8, 16, 16))
    # Non-trivial BN statistics so folding mistakes can't hide.
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])

    def perturb(path, leaf):
        name = path[-1].key
        r = np.random.RandomState(len(str(path)))
        if name == "mean":
            return jnp.asarray(leaf + 0.05 * r.randn(*leaf.shape), jnp.float32)
        if name == "var":
            return jnp.asarray(leaf * r.uniform(0.6, 1.5, leaf.shape), jnp.float32)
        return leaf

    stats = jax.tree_util.tree_map_with_path(perturb, stats)
    variables = {"params": variables["params"], "batch_stats": stats}

    video = jnp.asarray(np.random.RandomState(0).rand(2, 3, 8, 16, 16), jnp.float32)
    with jax.default_matmul_precision("highest"):
        seg_ref, mot_ref = model.apply(variables, video, train=False)

        folded = jax.tree.map(jnp.asarray, fold_variables(variables))
        folded_model = R2Plus1DMotionSegNet(folded=True)
        seg_f, mot_f = folded_model.apply(folded, video, train=False)

    np.testing.assert_allclose(np.asarray(seg_f), np.asarray(seg_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mot_f), np.asarray(mot_ref),
                               rtol=1e-4, atol=1e-6)
