"""End-state (distribution-level) cross-framework equivalence.

Past the tabular chaos horizon (~100 steps; see `results/parity/report.md`)
per-step loss tracing is the wrong instrument: losses diverge chaotically
while both trainers keep descending the same objective.  The right
equivalence claim for a *fully trained* run is distributional — the final
per-target flip rates / prediction gains of the two frameworks' trained
generators must agree within the spread that re-seeding either framework
produces.  This module computes those end-state metrics from a cfgan
bundle+state and its torch oracle (`house trainer.py:240-316` +
`house eval_utils.py:126-181` protocol: hard Gumbel, clamp to [0,1],
immutable-complement mask, the SAME frozen classifier scoring both sides).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tabular_endstate_metrics(
    bundle,
    state,
    oracle,
    clf_fn,  # (x,) -> logits, the SAME frozen classifier for both sides
    x_test,
    schema,
    num_classes: int,
    key,
) -> list[dict]:
    """Per-target flip/gain for BOTH frameworks' trained generators.

    Both sides draw the identical per-row Gumbel noise
    (`derive_gumbel_noise`) from the same per-target key, so the only
    difference between the `jax` and `torch` rows is the accumulated
    training divergence of the generators themselves.
    """
    from cfgan.masks.feature import immutable_complement_mask

    x = np.asarray(x_test, np.float32)
    mask = np.asarray(immutable_complement_mask(
        len(x), x.shape[1], schema.immutable_idx))
    probs_x = np.asarray(jax.nn.softmax(clf_fn(jnp.asarray(x)), axis=1))
    rows = []
    for t in range(num_classes):
        tt = np.full((len(x),), t, np.int32)
        k = jax.random.fold_in(key, t)
        cf_jax, cf_torch = oracle.cf_probe(bundle, state, x, tt, mask, k)
        for side, cf in (("jax", cf_jax), ("torch", cf_torch)):
            probs = np.asarray(jax.nn.softmax(
                clf_fn(jnp.asarray(cf)), axis=1))
            rows.append({
                "target": t,
                "side": side,
                "flip": float(np.mean(np.argmax(probs, 1) == t)),
                "gain": float(np.mean(probs[:, t] - probs_x[:, t])),
            })
    return rows


def endstate_deltas(rows: list[dict]) -> dict:
    """Per-target cross-framework |Δflip| / |Δgain| from metric rows."""
    by = {}
    for r in rows:
        by.setdefault(r["target"], {})[r["side"]] = r
    out = {"flip_delta": {}, "gain_delta": {}}
    for t, sides in sorted(by.items()):
        out["flip_delta"][t] = abs(sides["jax"]["flip"]
                                   - sides["torch"]["flip"])
        out["gain_delta"][t] = abs(sides["jax"]["gain"]
                                   - sides["torch"]["gain"])
    out["flip_delta_max"] = max(out["flip_delta"].values())
    out["gain_delta_max"] = max(out["gain_delta"].values())
    return out
