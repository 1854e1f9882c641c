import jax
import jax.numpy as jnp
import numpy as np

from cglb_tpu.transforms import Param, positive, softplus, softplus_inverse


def test_softplus_roundtrip():
    y = jnp.asarray([1e-5, 0.1, 1.0, 5.0, 50.0])
    np.testing.assert_allclose(
        np.asarray(softplus(softplus_inverse(y))), np.asarray(y), rtol=1e-12
    )


def test_positive_lower_bound_respected():
    t = positive(lower=1e-6)
    raw = jnp.asarray([-100.0, -5.0, 0.0, 5.0])
    vals = np.asarray(t.forward(raw))
    assert (vals >= 1e-6).all()


def test_param_create_roundtrip():
    p = Param.positive(2.5, lower=5e-3)
    np.testing.assert_allclose(float(p.value), 2.5, rtol=1e-10)
    assert p.trainable


def test_param_is_pytree_leaf_only_raw():
    p = Param.positive(1.5, lower=1e-6)
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 1
    # grads flow through the transform
    g = jax.grad(lambda q: q.value ** 2)(p)
    assert np.isfinite(float(g.raw))


def test_param_static_metadata_survives_tree_map():
    p = Param.positive(1.0, lower=1e-6, trainable=False)
    q = jax.tree_util.tree_map(lambda x: x + 1.0, p)
    assert q.trainable is False
    assert q.transform == p.transform
