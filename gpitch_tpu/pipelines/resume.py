"""Checkpoint / resume for long pipeline runs.

The reference has no failure handling (SURVEY.md section 5); restarting a
223-window separation meant recomputing everything.  Here training state
(the whole window bank + optimizer step) checkpoints every K steps and a
restart resumes idempotently from the latest checkpoint.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..utils.checkpoint import list_checkpoints, load_model, save_model
from .windowed_sgpr import optimize_bank

__all__ = ["optimize_bank_resumable"]


def optimize_bank_resumable(bank, num_steps: int, checkpoint_dir: str,
                            checkpoint_every: int = 100,
                            learning_rate: float = 0.01, method: str = "adam"):
    """optimize_bank with periodic checkpoints and automatic resume.

    Returns (bank, losses, start_step): if ``checkpoint_dir`` already holds
    checkpoints, optimization restarts from the newest one and only the
    remaining steps run.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    done = list_checkpoints(checkpoint_dir)
    start = done[-1] if done else 0
    if start:
        bank = load_model(checkpoint_dir, bank, step=start)

    all_losses = []
    step = start
    while step < num_steps:
        chunk = min(checkpoint_every, num_steps - step)
        bank, losses = optimize_bank(bank, num_steps=chunk,
                                     learning_rate=learning_rate, method=method)
        step += chunk
        all_losses.append(np.asarray(losses))
        save_model(checkpoint_dir, bank, step=step)

    losses = np.concatenate(all_losses) if all_losses else np.zeros(0)
    return bank, losses, start
