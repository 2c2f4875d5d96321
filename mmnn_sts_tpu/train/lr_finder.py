"""Leslie-Smith learning-rate range test.

Parity: /root/reference/utils/find_lr.py:27-111 — exponentially sweep the
learning rate from lr_start to lr_end over ~100 iterations on a fresh 80/20
split of the cohort, record per-step smoothed loss, and write lr_finder.png
(loss vs lr, log-x). The reference used the external torch-lr-finder
package with a hardcoded densenet121; here the sweep reuses the framework's
own jitted train step with an injected per-step learning-rate schedule.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import optax

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.loader import EpochBatcher, gather_superbatch
from ..models import build_model
from ..pipeline import make_split_dataset
from ..train.state import create_train_state
from ..train.steps import classification_train_step, survival_train_superstep
from ..utils.logging import get_logger

logger = get_logger()


def find_lr(
    cfg,
    flags,
    bundle,
    mesh,
    lr_start: float = 1e-7,
    lr_end: float = 100.0,
    num_iters: int = 100,
    smoothing: float = 0.05,
    output_dir: str = ".",
):
    rng = np.random.default_rng(cfg.hyperparameters.seed)
    uids = np.asarray(bundle.uids)
    order = rng.permutation(len(uids))
    cut = int(0.8 * len(uids))
    train_uids = uids[order[:cut]]

    train_ds = make_split_dataset(cfg, flags, bundle, train_uids, mesh)
    model = build_model(cfg, flags.images, flags.preop, flags.postop, False)

    schedule = optax.exponential_decay(
        init_value=lr_start,
        transition_steps=1,
        decay_rate=(lr_end / lr_start) ** (1.0 / num_iters),
    )
    tx = optax.chain(
        optax.add_decayed_weights(cfg.hyperparameters.weight_decay),
        optax.sgd(schedule, momentum=cfg.hyperparameters.momentum, nesterov=True),
    )
    sample = jax.tree.map(lambda x: x[:1], train_ds.model_inputs())
    state = create_train_state(model, tx, sample, seed=cfg.hyperparameters.seed)

    batcher = EpochBatcher(
        train_ds.num_samples,
        cfg.hyperparameters.train_batch_size,
        1,
        seed=cfg.hyperparameters.seed,
    )
    key = jax.random.key(cfg.hyperparameters.seed)
    lrs, losses = [], []
    avg_loss = None
    it = 0
    epoch = 0
    import jax.numpy as jnp

    pos_weight = None
    if not flags.survival:
        pos_weight = jnp.ones((train_ds.labels.shape[-1],))
    while it < num_iters:
        for idx in batcher.epoch_indices(epoch):
            if it >= num_iters:
                break
            key, k = jax.random.split(key)
            batch = gather_superbatch(train_ds, idx, mesh)
            if flags.survival:
                state, aux = survival_train_superstep(
                    state,
                    jax.tree.map(lambda x: x[None], batch["inputs"]),
                    batch["events"][None],
                    batch["durations"][None],
                    k,
                    blend=False,
                )
            else:
                state, aux = classification_train_step(
                    state, batch["inputs"], batch["labels"], pos_weight, k,
                    blend=False,
                )
            loss = float(aux["loss"])
            avg_loss = loss if avg_loss is None else (
                smoothing * loss + (1 - smoothing) * avg_loss
            )
            lrs.append(float(schedule(it)))
            losses.append(avg_loss)
            it += 1
        epoch += 1

    plt.figure()
    plt.plot(lrs, losses)
    plt.xscale("log")
    plt.xlabel("learning rate")
    plt.ylabel("smoothed loss")
    plt.savefig(os.path.join(output_dir, "lr_finder.png"))
    plt.close()
    best = lrs[int(np.nanargmin(losses))]
    logger.info(f"lr_finder: min-loss lr = {best:.2e}")
    return lrs, losses
