"""Optimizer factory — optax equivalent of reference optimization.py:6-75.

The reference keeps the learning rate in a mutable ``tf.Variable`` so the
schedule can update it without graph rebuilds (optimization.py:227).  We get
the same effect by building the optimizer as an lr-*free* optax transform
(clip -> scale_by_<method>) and applying ``-lr`` at update time, with lr
passed into the jitted train step as a traced scalar — zero recompiles across
the whole schedule.

Supported (reference optimization.py:14-37 + 2D extras, SURVEY C12/C25):
Adam, SGD, Momentum (Nesterov), Adadelta, and the 2D path's LAMB / RAdam /
AdamW, which the reference carries as ~1.5k LoC of hand-written TF1
optimizers (SURFGAN_2D/optim.py, lamb.py, rectified_adam.py) and which map to
optax transforms directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import optax


class Optimizer(NamedTuple):
    """An lr-free gradient transform plus the update-time lr application."""

    tx: optax.GradientTransformation
    name: str

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, state, params, lr):
        """Returns (new_params, new_state). `lr` is a traced scalar."""
        updates, new_state = self.tx.update(grads, state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state


def _scale_transform(
    name: str,
    *,
    beta1: Optional[float] = 0.0,
    beta2: Optional[float] = 0.9,
    rho: Optional[float] = 0.95,
    momentum: Optional[float] = 0.9,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    if name == "Adam":
        return optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8)
    if name == "SGD":
        return optax.identity()
    if name == "Momentum":
        # reference optimization.py:22: MomentumOptimizer(use_nesterov=True)
        return optax.trace(decay=momentum, nesterov=True)
    if name == "Adadelta":
        # reference optimization.py:20: AdadeltaOptimizer(rho, epsilon=1e-07)
        return optax.scale_by_adadelta(rho=rho, eps=1e-7)
    if name == "RAdam":
        # reference rectified_adam.py (175 LoC TF1 optimizer)
        return optax.scale_by_radam(b1=beta1, b2=beta2, eps=1e-8)
    if name == "LAMB":
        # reference SURFGAN_2D/optim.py:296-426 (BERT-style LAMB w/ trust ratio)
        return optax.chain(
            optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-6),
            optax.add_decayed_weights(weight_decay, mask=_decay_mask),
            optax.scale_by_trust_ratio(),
        )
    if name == "LARS":
        # reference SURFGAN_2D/main.py:21,140-141: tf.contrib LARSOptimizer
        # experiment (momentum=0, weight_decay=0 there; both configurable
        # here).  tf.contrib's eeta (trust coefficient) default is 0.001.
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=_decay_mask),
            optax.scale_by_trust_ratio(trust_coefficient=0.001),
            optax.trace(decay=momentum) if momentum else optax.identity(),
        )
    if name == "AdamW":
        # reference SURFGAN_2D/optim.py:191-293 (AdamWeightDecayOptimizer)
        return optax.chain(
            optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-6),
            optax.add_decayed_weights(weight_decay, mask=_decay_mask),
        )
    raise NotImplementedError(f"optimizer argument {name!r} not recognized or implemented")


def _decay_mask(params):
    """Weight-decay exclusion mask: the reference's LAMB/AdamW exclude biases
    and norm parameters (SURFGAN_2D/optim.py:281-293,414-426
    exclude_from_weight_decay=['LayerNorm','layer_norm','bias']).  In the flat
    name-keyed trees that means `.../bias`, the per-layer `noise_strength`
    scalars, and the spectral-norm power-iteration vectors `*_u` (which are
    non-trainable in the reference and must never move, ops/core.py)."""

    def keep(key: str) -> bool:
        leaf = key.rsplit("/", 1)[-1]
        return not (leaf == "bias" or leaf == "noise_strength" or leaf.endswith("_u"))

    return {k: keep(k) for k in params}


def make_optimizer(
    name: str,
    *,
    clipping: bool = False,
    beta1: Optional[float] = 0.0,
    beta2: Optional[float] = 0.9,
    rho: Optional[float] = 0.95,
    momentum: Optional[float] = 0.9,
    weight_decay: float = 0.01,
) -> Optimizer:
    """Build one network's optimizer.

    `clipping` prepends global-norm-1.0 clipping, matching
    reference optimization.py:66-67 (clip before the optimizer sees grads).
    """
    tx = _scale_transform(
        name, beta1=beta1, beta2=beta2, rho=rho, momentum=momentum, weight_decay=weight_decay
    )
    if clipping:
        tx = optax.chain(optax.clip_by_global_norm(1.0), tx)
    return Optimizer(tx=tx, name=name)


def make_optimizers_from_config(cfg) -> tuple:
    """(G, D) optimizers from a Config (reference optimization.py:6-45).

    clipping=False here: the train step clips via _clip_and_norms (which also
    records the norm telemetry) BEFORE optimizer.update — prepending optax's
    clip as well would recompute the global norm and rescale the whole tree a
    second time per step for no numerical effect."""
    g = make_optimizer(
        cfg.optimizer,
        clipping=False,
        beta1=cfg.adam_beta1,
        beta2=cfg.adam_beta2,
        rho=cfg.rho,
        momentum=cfg.momentum,
        weight_decay=getattr(cfg, "weight_decay", 0.01),
    )
    d = make_optimizer(
        cfg.d_optimizer,
        clipping=False,
        beta1=cfg.d_adam_beta1,
        beta2=cfg.d_adam_beta2,
        rho=cfg.d_rho,
        momentum=cfg.d_momentum,
        weight_decay=getattr(cfg, "d_weight_decay", 0.01),
    )
    return g, d
