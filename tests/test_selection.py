"""Epoch-snapshot serving selection (`cfgan.train.selection`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.train.selection import SnapshotSelector, lex_margins


def test_lex_margins_breaks_saturation_ties():
    """min-margin alone ties at a reference-1.0 target (margin caps at 0);
    the lexicographic sorted-margin score ranks by the next-worst margin."""
    ref = [1.0, 0.99, 0.98, 0.996]
    a = lex_margins([1.0, 0.991, 0.999, 1.0], ref)   # barely clears t1
    b = lex_margins([1.0, 0.996, 0.999, 1.0], ref)   # clears t1 by 5x more
    assert a[0] == b[0] == 0.0  # both saturate the binding t0 margin
    assert b > a  # ...but b's cushion wins the tie
    # a genuinely negative margin loses to any all-clear candidate
    c = lex_margins([0.9999, 0.996, 0.999, 1.0], ref)
    assert c < a


class _FakeBundle:
    recal_fn = None


@pytest.fixture()
def states():
    """Three fake 'epoch states' whose param value IS their quality."""
    class S:
        def __init__(self, v):
            class G:
                params = {"w": jnp.asarray(v)}
                stats = {}
            self.g = G()
            self.g_ema = None
    return [S(0.1), S(0.9), S(0.5)]


def test_selector_picks_argmax_and_scores_final_epoch(states):
    sel = SnapshotSelector(
        _FakeBundle(), score_fn=lambda gv: (float(gv["params"]["w"]),),
        every=2, total_epochs=3,
    )
    for i, st in enumerate(states):
        sel.epoch_cb(i + 1, st)
    # every=2 scores epoch 2, and epoch 3 because it is final
    assert [r["epoch"] for r in sel.ladder] == [2, 3]
    gv, info = sel.best()
    assert info["candidate"] == "snapshot_e2_live"
    assert float(gv["params"]["w"]) == pytest.approx(0.9)
    assert info["scores"]["snapshot_e2_live"] == [pytest.approx(0.9)]


def test_selector_best_is_host_copied(states):
    """The kept snapshot must survive donation of the state it came from:
    best() returns a fresh device array, not a reference into the state."""
    sel = SnapshotSelector(
        _FakeBundle(), score_fn=lambda gv: (float(gv["params"]["w"]),),
        every=1, total_epochs=1,
    )
    sel.epoch_cb(1, states[1])
    src = states[1].g.params["w"]
    gv, _ = sel.best()
    assert gv["params"]["w"] is not src
    np.testing.assert_allclose(gv["params"]["w"], 0.9)


def test_selector_before_any_score_raises():
    sel = SnapshotSelector(_FakeBundle(), score_fn=lambda gv: (0.0,),
                           every=5, total_epochs=10)
    with pytest.raises(ValueError, match="before any epoch"):
        sel.best()


def test_selector_includes_ema_candidates():
    """EMA-carrying states contribute ema_recal_{train,ones} candidates
    through bundle.recal_fn; the best can be an EMA snapshot."""
    calls = []

    class Bundle:
        @staticmethod
        def recal_fn(params, stats, x, key, *, mask_mode):
            calls.append(mask_mode)
            return {}

    class S:
        class g:
            params = {"w": jnp.asarray(0.2)}
            stats = {}
        g_ema = {"w": jnp.asarray(0.8)}

    sel = SnapshotSelector(
        Bundle(), score_fn=lambda gv: (float(gv["params"]["w"]),),
        every=1, total_epochs=1, x_recal=jnp.zeros((4, 2)),
        recal_key=jax.random.key(0),
    )
    sel.epoch_cb(1, S())
    assert calls == ["train", "ones"]
    gv, info = sel.best()
    assert info["candidate"] == "snapshot_e1_ema_recal_train"
    assert [r["candidate"] for r in sel.ladder] == [
        "live", "ema_recal_train", "ema_recal_ones"]
