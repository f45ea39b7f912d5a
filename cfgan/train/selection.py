"""Epoch-snapshot serving selection: ship the best generator the training
TRAJECTORY produced, not whichever one the final epoch lands on.

Motivation (VERDICT r4 #1-3): GAN end states are chaotic — long-schedule
CounteRGAN training oscillates through many near-optimal generators, and
the measured per-target flip spread across the trajectory dwarfs the
spread across recipes (results/house_snapshot_select/,
results/house_ladder_matrix/).  The reference always serves the final
epoch (`mnist/trainer.py:163`, `house trainer.py:378` save once at the
end); this module generalizes cfgan's round-3 serving-candidate selection
(`cfgan.train.builders.select_g_serving_variables`: {live, EMA+recal}
at end of training, validation-scored) along the time axis.

Usage: construct a `SnapshotSelector`, pass its `.epoch_cb` to
`train_countergan_loop(epoch_cb=...)`, then take `.best()` after the
loop.  Every `every` epochs (and at the final epoch) it scores each
serving candidate of the current state — live params, and for
EMA-carrying states the EMA params with BatchNorm statistics
recalibrated under both mask distributions (see `make_bn_recalibrator`)
— with a caller-supplied validation score, keeping the argmax as a HOST
copy (the scanned epoch donates its input state, so a device reference
would be invalidated by the next epoch).

Selection sees VALIDATION data only; the experiment mains score the
selected snapshot on test exactly once, in the eval stage.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def lex_margins(flips, reference) -> tuple:
    """Lexicographic sorted-margin score: per-target flip margins over a
    reference vector, sorted ascending, compared as a tuple — maximizes
    the binding (worst) margin first, then the next-worst, and so on.

    This fixes the round-4 rule's saturation tie (min-margin alone caps
    at 0.0 wherever the reference's committed flip is 1.0, so every
    near-perfect snapshot tied at +0.0000 and the tie-break was noise —
    results/house_snapshot_select_e10/).
    """
    import numpy as np

    f = np.asarray(flips, dtype=np.float64)
    r = np.asarray(reference, dtype=np.float64)
    return tuple(np.sort(f - r))


class SnapshotSelector:
    """Validation-scored serving selection over the training trajectory.

    Parameters
    ----------
    bundle : CounterGANBundle (for `recal_fn` and EMA candidates)
    score_fn : (g_variables) -> comparable tuple; HIGHER is better.
        Must look at validation data only.
    every : score every K epochs (the final epoch is always scored).
    total_epochs : the run length (identifies the final epoch).
    x_recal : training inputs for BN recalibration of EMA candidates.
    recal_key : PRNG key for the recalibration batches.
    include_ema : score EMA+recal candidates at each rung (default True).
    """

    def __init__(self, bundle, *, score_fn: Callable, every: int,
                 total_epochs: int, x_recal=None, recal_key=None,
                 include_ema: bool = True):
        self.bundle = bundle
        self.score_fn = score_fn
        self.every = max(1, every)
        self.total_epochs = total_epochs
        self.x_recal = None if x_recal is None else jnp.asarray(x_recal)
        self.recal_key = recal_key
        self.include_ema = include_ema
        self.ladder: list[dict] = []
        self._best = None  # (score, name, host-copied g_vars)

    def _candidates(self, state):
        yield "live", {"params": state.g.params, **state.g.stats}
        if (self.include_ema and state.g_ema is not None
                and self.bundle.recal_fn is not None
                and self.x_recal is not None):
            for mode in ("train", "ones"):
                stats = self.bundle.recal_fn(
                    state.g_ema, dict(state.g.stats), self.x_recal,
                    self.recal_key, mask_mode=mode,
                )
                yield f"ema_recal_{mode}", {"params": state.g_ema, **stats}

    def epoch_cb(self, epoch: int, state) -> None:
        """Pass to `train_countergan_loop(epoch_cb=...)`; `epoch` is
        1-based (the loop calls it after the epoch has run)."""
        if epoch % self.every and epoch != self.total_epochs:
            return
        for cname, gv in self._candidates(state):
            score = self.score_fn(gv)
            name = f"snapshot_e{epoch}_{cname}"
            self.ladder.append({
                "epoch": epoch, "candidate": cname,
                "score": [float(s) for s in score],
            })
            if self._best is None or score > self._best[0]:
                self._best = (score, name, jax.device_get(gv))

    def best(self):
        """(g_variables, info) for the best-scoring snapshot; call after
        the training loop.  `info` carries the full ladder for the run's
        serving-selection metadata."""
        if self._best is None:
            raise ValueError(
                "SnapshotSelector.best() before any epoch was scored — was "
                "epoch_cb passed to the training loop?"
            )
        score, name, gv = self._best
        info = {
            "candidate": name,
            "scores": {name: [float(s) for s in score]},
            "ladder": self.ladder,
        }
        return jax.device_put(gv), info
