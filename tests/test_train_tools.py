"""Early stopping, LR schedules, debug utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.train.tools import (
    EarlyStopping,
    cosine_schedule,
    dotdict,
    exponential_decay_schedule,
)
from fetode_tpu.utils.debug import check_finite, debug_nans, tree_health


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert es.step(1.0)
    assert not es.step(1.5)
    assert not es.step(1.2) and es.should_stop
    assert es.best == 1.0


def test_schedules():
    exp = exponential_decay_schedule(1.0, decay=0.5, every=2)
    assert exp(0) == 1.0 and exp(2) == 0.5 and exp(4) == 0.25
    cos = cosine_schedule(1.0, total_steps=100)
    assert float(cos(0)) == pytest.approx(1.0)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(cos(50)) == pytest.approx(0.5, abs=1e-6)


def test_cosine_schedule_in_optimizer():
    import jax

    from fetode_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones(3)}
    tx = make_optimizer(cosine_schedule(0.1, 10), kind="adam", params=params)
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, state = tx.update(g, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_dotdict():
    d = dotdict(a=1)
    assert d.a == 1
    d.b = 2
    assert d["b"] == 2


def test_check_finite():
    check_finite({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        check_finite({"x": jnp.asarray([1.0, jnp.nan])})


def test_tree_health():
    h = tree_health({"a": jnp.asarray([1.0, -5.0]), "b": jnp.asarray([jnp.inf])})
    vals = list(h.values())
    assert vals[0]["max_abs"] == 5.0 and vals[0]["nonfinite"] == 0
    assert vals[1]["nonfinite"] == 1


def test_debug_nans_context():
    import jax

    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_minibatch_epochs_scanner_matches_sequential():
    """One dispatch of E epochs == E sequential make_minibatch_epoch calls
    with the same derived keys (keyed and unkeyed)."""
    import jax
    import optax

    from fetode_tpu.train.loop import (init_state, make_minibatch_epoch,
                                       make_minibatch_epochs_scanner)

    def loss_keyed(p, key, xb, yb):
        noise = 0.01 * jax.random.normal(key, yb.shape)
        return jnp.mean((xb @ p["w"] - yb - noise) ** 2)

    def loss_plain(p, xb, yb):
        return jnp.mean((xb @ p["w"] - yb) ** 2)

    key = jax.random.PRNGKey(3)
    params = {"w": jax.random.normal(key, (5, 1))}
    tx = optax.adam(1e-2)
    E, nb, B = 2, 3, 4
    xs = jax.random.normal(jax.random.fold_in(key, 1), (E, nb, B, 5))
    ys = jax.random.normal(jax.random.fold_in(key, 2), (E, nb, B, 1))

    for keyed, loss in ((True, loss_keyed), (False, loss_plain)):
        scan_fn = make_minibatch_epochs_scanner(loss, tx, keyed=keyed)
        seq_fn = make_minibatch_epoch(loss, tx, keyed=keyed)
        s1 = init_state(params, tx)
        if keyed:
            s1, losses = scan_fn(s1, key, (xs, ys))
            ekeys = jax.random.split(key, E)
        else:
            s1, losses = scan_fn(s1, (xs, ys))
        assert losses.shape == (E, nb)
        s2 = init_state(params, tx)
        for e in range(E):
            if keyed:
                s2, l2 = seq_fn(s2, ekeys[e], (xs[e], ys[e]))
            else:
                s2, l2 = seq_fn(s2, (xs[e], ys[e]))
            np.testing.assert_allclose(np.asarray(losses[e]), np.asarray(l2),
                                       rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.params["w"]),
                                   np.asarray(s2.params["w"]), rtol=1e-6)
