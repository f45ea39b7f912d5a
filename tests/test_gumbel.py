"""Gumbel-Softmax straight-through estimator properties."""
import numpy as np
import jax
import jax.numpy as jnp

from cfgan.nn.gumbel import gumbel_softmax


def test_soft_sums_to_one():
    key = jax.random.key(0)
    logits = jax.random.normal(key, (32, 9))
    y = gumbel_softmax(key, logits, tau=0.5, hard=False)
    np.testing.assert_allclose(np.asarray(y.sum(axis=1)), 1.0, atol=1e-5)
    assert float(y.min()) >= 0.0


def test_hard_is_one_hot_forward():
    key = jax.random.key(1)
    logits = jax.random.normal(key, (32, 9))
    y = gumbel_softmax(key, logits, tau=0.5, hard=True)
    y_np = np.asarray(y)
    np.testing.assert_allclose(y_np.sum(axis=1), 1.0, atol=1e-5)
    assert set(np.unique(np.round(y_np, 5))).issubset({0.0, 1.0})


def test_hard_gradient_is_soft_gradient():
    """Straight-through: d(hard)/d(logits) == d(soft)/d(logits)."""
    key = jax.random.key(2)
    logits = jax.random.normal(key, (4, 5))
    w = jax.random.normal(jax.random.key(3), (5,))

    def f(hard):
        def loss(lg):
            return jnp.sum(gumbel_softmax(key, lg, tau=0.7, hard=hard) @ w)
        return jax.grad(loss)(logits)

    np.testing.assert_allclose(np.asarray(f(True)), np.asarray(f(False)),
                               atol=1e-6)


def test_low_tau_concentrates():
    key = jax.random.key(4)
    logits = jnp.asarray([[5.0, 0.0, -5.0]] * 64)
    y = gumbel_softmax(key, logits, tau=0.1, hard=False)
    # with a strong logit gap and low temperature, argmax is class 0 mostly
    assert float((jnp.argmax(y, axis=1) == 0).mean()) > 0.9
