"""Learning-rate schedule + optimizer.

Parity with the reference training configuration:
  * SGD, nesterov momentum, weight decay applied to the gradient (torch SGD
    semantics: wd * param added to the grad BEFORE the momentum buffer) —
    /root/reference/main.py:156-159, 410-413;
  * OneCycleLR with torch defaults (pct_start=0.3, cosine anneal,
    div_factor=25, final_div_factor=1e4) — main.py:160, 414. optax's
    cosine_onecycle_schedule implements exactly these defaults.
"""

from __future__ import annotations

import optax


def onecycle(lr: float, steps_per_epoch: int, epochs: int) -> optax.Schedule:
    total = steps_per_epoch * epochs
    # optax's piecewise boundaries floor to ints: a warmup interval of
    # int(0.3 * total) == 0 steps divides by zero and poisons the whole run
    # with NaN learning rates — guard very short runs (e.g. smoke tests).
    total = max(total, 4)
    return optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=lr,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def steps_per_epoch(num_samples: int, step_batch: int) -> int:
    """ceil semantics matching /root/reference/main.py:141-145, 404-407."""
    if num_samples % step_batch == 0:
        return num_samples // step_batch
    return 1 + num_samples // step_batch


def make_optimizer(
    lr: float,
    steps_per_epoch_: int,
    epochs: int,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    schedule = onecycle(lr, steps_per_epoch_, epochs)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=True),
    )
