"""OO facade smoke tests: reference-named classes wrap the functional core."""

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.nn.modules import (
    KAN,
    KANFET,
    FerroelectricBasis,
    FerroelectricBasisConv2d,
    NoisyFerroelectricBasis,
    TwoDimensionFerroelectricBasis,
)


def test_kan_facade(key):
    m = KAN([2, 10, 2], grid_size=5)
    p = m.init(key, jnp.float64)
    y = m(p, jax.random.normal(key, (4, 2), jnp.float64))
    assert y.shape == (4, 2)
    assert float(m.regularization_loss(p)) > 0


def test_kanfet_facade_reference_ctor(key):
    m = KANFET(layers_hidden=[2, 10, 2], grid_size=5)
    p = m.init(key, jnp.float64)
    s = m.init_state((4,), jnp.float64)
    y, s1 = m(p, jax.random.normal(key, (4, 2), jnp.float64), s)
    assert y.shape == (4, 2)
    assert len(s1) == 2


def test_ferro_basis_facade(key):
    m = FerroelectricBasis(3, 5, 4)
    p = m.init(key, jnp.float64)
    s = m.init_state((2,), jnp.float64)
    y, s1, basis = m(p, s, jax.random.normal(key, (2, 3), jnp.float64),
                     return_activations=True)
    assert y.shape == (2, 5) and basis.shape == (2, 3, 5, 4)

    noisy = NoisyFerroelectricBasis(3, 5, 4)
    yn, _ = noisy(noisy.init(key, jnp.float64), s,
                  jnp.zeros((2, 3), jnp.float64), noise_key=key)
    assert not np.allclose(np.asarray(yn), 0.0)


def test_two_dim_and_conv_facades(key):
    m2 = TwoDimensionFerroelectricBasis(3, 4)
    p = m2.init(key, jnp.float64)
    s = m2.init_state((2,), jnp.float64)
    w, _ = m2(p, s, jax.random.normal(key, (2, 3), jnp.float64))
    assert w.shape == (2, 3, 4)

    conv = FerroelectricBasisConv2d(1, 4, kernel_size=3, padding=1,
                                    out_chunk=2)
    cp = conv.init(key, jnp.float64)
    y, _ = conv(cp, jax.random.normal(key, (2, 1, 6, 6), jnp.float64))
    assert y.shape == (2, 4, 6, 6)
