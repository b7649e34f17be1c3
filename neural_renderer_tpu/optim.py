"""Custom Adam: element-wise zero-gradient skip + per-parameter LR.

Reference ``neural_renderer/optimizers.py``: an Adam whose CUDA update rule
(a) leaves m / v / param untouched wherever ``grad == 0.0`` — essential here
because the rasterizer backward writes exact zeros for faces / texels that
touch no pixel, and vanilla Adam would keep drifting them on momentum — and
(b) multiplies the learning rate by an optional per-parameter ``param.lr``.

Provided both as an optax-style gradient transformation (``adam``) and as a
tiny stateful convenience class (``Adam``) mirroring the Chainer usage
(``optimizer.setup(params)`` / ``optimizer.update(grads)``).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jax.Array   # scalar int32
    m: dict
    v: dict


def adam(alpha=0.001, beta1=0.9, beta2=0.999, eps=1e-8, lr_scales=None):
    """optax-style (init_fn, update_fn) implementing the reference AdamRule.

    lr_scales: optional pytree (matching the params) of per-leaf LR
    multipliers (the reference's ``param.lr``, optimizers.py:16-17).
    update_fn returns *updates to add* to the params.
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(count=jnp.zeros((), jnp.int32), m=zeros,
                         v=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        # chainer AdamRule.lr: alpha * sqrt(1 - b2^t) / (1 - b1^t)
        t = count.astype(jnp.float32)
        lr_t = alpha * jnp.sqrt(1.0 - beta2 ** t) / (1.0 - beta1 ** t)

        def leaf(g, m, v, scale):
            active = g != 0.0          # optimizers.py:23 'if (grad != 0.0)'
            # the reference skips the WHOLE kernel when the effective lr is
            # zero — m and v stay frozen too (optimizers.py:17-18
            # 'lr = self.lr * param.lr; if lr != 0:'), not just the applied
            # update.  Matters if a per-param lr is re-enabled mid-run.
            active = active & (jnp.asarray(scale) != 0.0)
            m_new = jnp.where(active, m + (1 - beta1) * (g - m), m)
            v_new = jnp.where(active, v + (1 - beta2) * (g * g - v), v)
            v_new = jnp.maximum(v_new, 0.0)
            upd = jnp.where(
                active, -lr_t * scale * m_new / (jnp.sqrt(v_new) + eps), 0.0)
            return upd, m_new, v_new

        if lr_scales is None:
            scales = jax.tree.map(lambda g: 1.0, grads)
        else:
            scales = lr_scales
        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        flat_s = treedef.flatten_up_to(scales)
        out = [leaf(g, m, v, s)
               for g, m, v, s in zip(flat_g, flat_m, flat_v, flat_s)]
        updates = treedef.unflatten([o[0] for o in out])
        m_new = treedef.unflatten([o[1] for o in out])
        v_new = treedef.unflatten([o[2] for o in out])
        return updates, AdamState(count=count, m=m_new, v=v_new)

    return init_fn, update_fn


class Adam:
    """Stateful convenience wrapper mirroring the reference usage
    (``neural_renderer.Adam``; chainer ``optimizer.setup`` / ``update``)."""

    def __init__(self, alpha=0.001, beta1=0.9, beta2=0.999, eps=1e-8,
                 lr_scales=None):
        self._init_fn, self._update_fn = adam(alpha, beta1, beta2, eps,
                                              lr_scales)
        self.state = None

    def setup(self, params):
        self.state = self._init_fn(params)
        return self

    def update(self, params, grads):
        """Apply one step; returns the new params."""
        updates, self.state = self._update_fn(grads, self.state)
        return jax.tree.map(lambda p, u: p + u, params, updates)
