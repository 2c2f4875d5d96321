"""Training-curve and diagnostic plots (artifact-name parity).

Reproduces the reference's artifact surface:
  * train_val_loss.png, train_val_f1.png (/root/reference/main.py:313-327)
  * train_val_c_score.png (main.py:591-601)
  * val_loss_by_cm.png, val_loss_by_class.png — the LossTracker
    confusion-quadrant diagnostics (/root/reference/utils/utils.py:392-449)
  * gblend_weights_history.csv (/root/reference/losses/GradientBlender.py:255)
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def save_loss_curves(train_losses, val_losses, out_dir="."):
    plt.figure()
    plt.plot(train_losses, label="Train Loss")
    plt.plot(val_losses, label="Validation Loss")
    plt.legend()
    plt.savefig(os.path.join(out_dir, "train_val_loss.png"))
    plt.close()


def save_f1_curves(train_f1s, val_f1s, out_dir="."):
    plt.figure()
    plt.plot(train_f1s, label="Train F1 Score")
    plt.plot(val_f1s, label="Validation F1 Score")
    plt.legend()
    plt.savefig(os.path.join(out_dir, "train_val_f1.png"))
    plt.close()


def save_c_score_curves(train_cs, val_cs, out_dir="."):
    plt.figure()
    plt.plot(train_cs, label="Train C Score")
    plt.plot(val_cs, label="Validation C Score")
    plt.legend()
    plt.savefig(os.path.join(out_dir, "train_val_c_score.png"))
    plt.close()


def save_blend_history(history, out_dir="."):
    np.savetxt(
        os.path.join(out_dir, "gblend_weights_history.csv"),
        np.asarray(history),
        delimiter=",",
    )


class LossTracker:
    """Confusion-quadrant loss diagnostics.

    Parity: /root/reference/utils/utils.py:392-449 — collects mean loss of
    TP/FP/FN/TN predictions and per-class (VS/DM) losses each validation
    epoch, and renders val_loss_by_cm.png / val_loss_by_class.png.
    """

    def __init__(self):
        self.tp_loss, self.fp_loss, self.fn_loss, self.tn_loss = [], [], [], []
        self.total_loss, self.vs_loss, self.dm_loss = [], [], []

    def update(self, preds, labels, loss):
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        loss = np.asarray(loss)

        def mean_where(mask):
            return float(loss[mask].mean()) if mask.any() else float("nan")

        self.tp_loss.append(mean_where((preds == 1) & (labels == 1)))
        self.fp_loss.append(mean_where((preds == 1) & (labels == 0)))
        self.fn_loss.append(mean_where((preds == 0) & (labels == 1)))
        self.tn_loss.append(mean_where((preds == 0) & (labels == 0)))
        self.total_loss.append(float(loss.mean()))
        self.vs_loss.append(float(loss[:, 0].mean()))
        self.dm_loss.append(float(loss[:, 1].mean()))

    def save_plots(self, out_dir="."):
        plt.figure()
        plt.plot(self.tp_loss, label="tp loss")
        plt.plot(self.fp_loss, label="fp loss")
        plt.plot(self.fn_loss, label="fn loss")
        plt.plot(self.tn_loss, label="tn loss")
        plt.plot(self.total_loss, label="all loss (mean)")
        plt.legend()
        plt.savefig(os.path.join(out_dir, "val_loss_by_cm.png"))
        plt.close()

        plt.figure()
        plt.plot(self.vs_loss, label="VS loss")
        plt.plot(self.dm_loss, label="DM loss")
        plt.plot(self.total_loss, label="All loss (mean)")
        plt.legend()
        plt.savefig(os.path.join(out_dir, "val_loss_by_class.png"))
        plt.close()
