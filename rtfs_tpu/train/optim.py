"""Optimizer factory + LR schedules (TPU-native training system).

Counterpart of the reference ``src/system/optimizers.py`` (string-keyed
factory over 23 torch/torch_optimizer entries) and its schedulers
(ReduceLROnPlateau ``train.py:84-86``, manual epoch divide
``src/system/core.py:204-212``). Built on optax; the learning rate is
injected as a mutable hyperparameter so plateau/epoch schedules mutate it
without rebuilding optimizer state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import optax


_FACTORIES = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "adamax": optax.adamax,
    "adafactor": optax.adafactor,
    "adabelief": optax.adabelief,
    "lamb": optax.lamb,
    "lars": optax.lars,
    "radam": optax.radam,
    "novograd": optax.novograd,
    "yogi": optax.yogi,
    "sm3": optax.sm3,
    "fromage": optax.fromage,
    "lion": optax.lion,
    "nadam": optax.nadam,
    "nadamw": optax.nadamw,
    "amsgrad": optax.amsgrad,
}


def make_optimizer(
    optimizer: str = "adamw",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    clip_grad_norm: Optional[float] = 5.0,
    **kwargs: Any,
) -> optax.GradientTransformation:
    """String → optax chain: [global-norm clip] → optimizer(lr, wd).

    Matches the reference's training recipe: AdamW(lr 1e-3, wd 0.1) with
    ``gradient_clip_val=5.0`` (``train.py:81-86,143``). The lr is wrapped in
    ``inject_hyperparams`` so schedules can update
    ``opt_state.hyperparams["learning_rate"]`` in place.
    """
    name = optimizer.lower()
    if name not in _FACTORIES:
        raise ValueError(
            f"Unknown optimizer '{optimizer}'. Available: {sorted(_FACTORIES)}"
        )
    factory = _FACTORIES[name]

    def build(learning_rate):
        try:
            return factory(
                learning_rate=learning_rate, weight_decay=weight_decay, **kwargs
            )
        except TypeError:
            return factory(learning_rate=learning_rate, **kwargs)

    opt = optax.inject_hyperparams(build)(learning_rate=lr)
    if clip_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_grad_norm), opt)
    return opt


def get_lr(opt_state) -> float:
    """Read the current injected learning rate out of an optimizer state."""
    for elem in jax_tree_iter(opt_state):
        if hasattr(elem, "hyperparams") and "learning_rate" in elem.hyperparams:
            return float(elem.hyperparams["learning_rate"])
    raise ValueError("no injected learning_rate found in opt_state")


def set_lr(opt_state, lr: float):
    """Return a new opt_state with the injected learning rate replaced."""
    import jax
    import jax.numpy as jnp

    def replace(elem):
        if hasattr(elem, "hyperparams") and "learning_rate" in elem.hyperparams:
            hp = dict(elem.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return elem._replace(hyperparams=hp)
        return elem

    if hasattr(opt_state, "hyperparams"):
        return replace(opt_state)
    if isinstance(opt_state, tuple):
        return tuple(set_lr(s, lr) if _has_lr(s) else s for s in opt_state)
    return opt_state


def _has_lr(s) -> bool:
    if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
        return True
    if isinstance(s, tuple):
        return any(_has_lr(x) for x in s)
    return False


def jax_tree_iter(state):
    """DFS over optax state tuples yielding every node."""
    yield state
    if isinstance(state, tuple):
        for s in state:
            yield from jax_tree_iter(s)


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch ReduceLROnPlateau parity).

    Reference wiring: patience from ``sche.patience``, factor ``sche.factor``
    when ``training.half_lr`` (``train.py:84-86``).
    """

    factor: float = 0.5
    patience: int = 10
    best: float = float("inf")
    num_bad_epochs: int = 0
    min_lr: float = 0.0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr


@dataclasses.dataclass
class EpochDivideLR:
    """Manual epoch-wise LR divide (reference ``core.py:204-212``)."""

    base_lr: float
    divide_by: Optional[float] = None
    period: int = 0

    def lr_for_epoch(self, epoch: int, current_lr: float) -> float:
        if not self.divide_by or self.period <= 0 or epoch == 0:
            return current_lr
        if epoch % self.period == 0:
            return self.base_lr / (self.divide_by ** (epoch // self.period))
        return current_lr
