"""Custom Adam semantics (reference optimizers.py): element-wise zero-grad
skip and per-parameter LR multipliers."""

import numpy as np

import neural_renderer_tpu as nr


def test_zero_grad_skip():
    import jax.numpy as jnp
    params = dict(w=jnp.array([1.0, 2.0, 3.0]))
    grads = dict(w=jnp.array([0.5, 0.0, -0.5]))

    init_fn, update_fn = nr.adam(alpha=0.1)
    state = init_fn(params)
    for _ in range(5):
        updates, state = update_fn(grads, state)
        params = dict(w=params['w'] + updates['w'])
    w = np.asarray(params['w'])
    assert w[0] < 1.0          # moved against positive grad
    assert w[1] == 2.0         # zero grad -> completely untouched
    assert w[2] > 3.0
    # m/v state untouched for the zero-grad element too
    assert float(state.m['w'][1]) == 0.0
    assert float(state.v['w'][1]) == 0.0


def test_per_param_lr():
    import jax.numpy as jnp
    params = dict(a=jnp.array([1.0]), b=jnp.array([1.0]))
    grads = dict(a=jnp.array([1.0]), b=jnp.array([1.0]))

    init_fn, update_fn = nr.adam(alpha=0.1,
                                 lr_scales=dict(a=1.0, b=0.1))
    state = init_fn(params)
    updates, state = update_fn(grads, state)
    # identical grads; b's step is scaled by 0.1
    np.testing.assert_allclose(float(updates['b'][0]),
                               0.1 * float(updates['a'][0]), rtol=1e-6)


def test_adam_class_wrapper():
    import jax.numpy as jnp
    params = dict(w=jnp.array([1.0, -1.0]))
    opt = nr.Adam(alpha=0.1).setup(params)
    new_params = opt.update(params, dict(w=jnp.array([1.0, -1.0])))
    w = np.asarray(new_params['w'])
    assert w[0] < 1.0 and w[1] > -1.0


def test_matches_reference_formula():
    """Single-element check against the hand-computed chainer AdamRule
    update: m,v from zero state, lr_t with bias correction."""
    import jax.numpy as jnp
    alpha, b1, b2, eps = 0.001, 0.9, 0.999, 1e-8
    g = 0.3
    init_fn, update_fn = nr.adam(alpha, b1, b2, eps)
    state = init_fn(dict(w=jnp.zeros(1)))
    updates, state = update_fn(dict(w=jnp.array([g])), state)

    m = (1 - b1) * g
    v = (1 - b2) * g * g
    lr_t = alpha * np.sqrt(1 - b2) / (1 - b1)
    expected = -lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(float(updates['w'][0]), expected, rtol=1e-5)
