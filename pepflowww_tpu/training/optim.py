"""Optimizer, plateau scheduler, NaN rescue.

Reproduces the reference's training numerics (`pepflow/utils/train.py:11-53`,
`train.py:125-146`) with optax:

* Adam/AdamW with configurable betas/lr/weight-decay
* grad-norm clip at max_grad_norm (100.0)
* NaN rescue: non-finite loss is zeroed for the step; non-finite gradient
  entries are zeroed elementwise (train.py:125-139) — expressed as pure ops,
  no host round-trip
* ReduceLROnPlateau as a small host-side controller mutating the injected lr
  (the reference steps it on validation loss, train.py's validate:182-185)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax


def make_optimizer(opt_cfg: dict, max_grad_norm: float = 100.0, accum_grad: int = 1):
    """optax chain mirroring get_optimizer + clip_grad_norm_."""
    lr = float(opt_cfg.get("lr", 5e-4))
    b1 = float(opt_cfg.get("beta1", 0.9))
    b2 = float(opt_cfg.get("beta2", 0.999))
    wd = float(opt_cfg.get("weight_decay", 0.0))
    kind = opt_cfg.get("type", "adam")

    if kind not in ("adam", "adamw"):
        raise ValueError(f"Unknown optimizer type: {kind}")

    def build(learning_rate):
        base = (
            optax.adam(learning_rate, b1=b1, b2=b2)
            if kind == "adam" and wd == 0.0
            else optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=wd)
        )
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), base)

    # inject_hyperparams exposes opt_state.hyperparams["learning_rate"] so the
    # plateau controller can mutate it between steps without retracing.
    tx = optax.inject_hyperparams(build)(learning_rate=lr)

    # Gradient accumulation (config key `accum_grad`; present-but-disabled in
    # the reference, configs/learn_angle.yaml:47 / train.py:122,144).
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx


def _hyperparams(opt_state):
    """Find the inject_hyperparams dict, unwrapping MultiSteps if present."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_opt_state"):
        return _hyperparams(opt_state.inner_opt_state)
    raise AttributeError("no hyperparams found in optimizer state")


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams(opt_state)["learning_rate"])


def set_learning_rate(opt_state, lr: float) -> None:
    _hyperparams(opt_state)["learning_rate"] = lr


def warmup_schedule(base_lr: float, warmup_steps: int):
    """Linear warmup to base_lr (pepflow/utils/train.py:56-60 equivalent).

    Compose with make_optimizer by passing the returned schedule as lr.
    """
    return optax.linear_schedule(0.0, base_lr, warmup_steps)


def zero_nans(tree):
    """Zero non-finite entries elementwise (train.py:136-139)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), tree
    )


def sum_weighted_losses(losses: dict, weights: dict | None):
    """pepflow/utils/train.py:143-155."""
    if weights is None:
        return sum(losses.values())
    return sum(weights.get(k, 0.0) * v for k, v in losses.items())


@dataclasses.dataclass
class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau(min mode) equivalent."""

    factor: float = 0.8
    patience: int = 10
    min_lr: float = 5e-6
    threshold: float = 1e-4  # torch default, rel mode
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict):
        self.best = d["best"]
        self.num_bad = d["num_bad"]
