"""Orbax checkpoint round-trip + soup averaging + misc utils tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.train.checkpoint import (
    find_last_checkpoint, restore_checkpoint, restore_params_soup, save_checkpoint,
)
from iterated_learning_for_vlm_tpu.train.optim import adamw_init, trainable_mask_tree
from iterated_learning_for_vlm_tpu.train.train_state import TrainState


def _tiny_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "w": jnp.asarray(rng.randn(4, 4).astype(np.float32)),
        "space_dict": jnp.asarray(rng.randn(8, 4).astype(np.float32)),
    }
    return TrainState.create(
        params, adamw_init(params), trainable_mask_tree(params, frozenset()),
        params["space_dict"],
    )


def test_roundtrip(tmp_path):
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          hold_codebook=jnp.asarray(1.0))
    save_checkpoint(str(tmp_path), state, 7)
    template = _tiny_state(seed=1)
    restored = restore_checkpoint(str(tmp_path / "ckpt_7"), template)
    assert int(restored.step) == 7
    assert float(restored.hold_codebook) == 1.0
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))
    np.testing.assert_array_equal(np.asarray(restored.stored_codebook),
                                  np.asarray(state.stored_codebook))


@pytest.mark.parametrize("use_async", [False, True])
def test_rerun_overwrites_stale_checkpoint(tmp_path, use_async):
    """Re-running an experiment into the same output dir must replace a stale
    ``ckpt_{step}`` (reference ``torch.save`` overwrites silently; Orbax would
    otherwise abort the run with "destination already exists")."""
    from iterated_learning_for_vlm_tpu.train.checkpoint import wait_for_saves

    stale, fresh = _tiny_state(0), _tiny_state(1)
    save_checkpoint(str(tmp_path), stale, 3, use_async=use_async)
    save_checkpoint(str(tmp_path), fresh, 3, use_async=use_async)
    wait_for_saves()
    restored = restore_checkpoint(str(tmp_path / "ckpt_3"), _tiny_state(2))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(fresh.params["w"]))


def test_find_last(tmp_path):
    for step in (5, 20, 10):
        save_checkpoint(str(tmp_path), _tiny_state(), step)
    assert find_last_checkpoint(str(tmp_path)).endswith("ckpt_20")
    assert find_last_checkpoint(str(tmp_path / "missing")) is None


def test_soup_average(tmp_path):
    s1, s2 = _tiny_state(0), _tiny_state(1)
    save_checkpoint(str(tmp_path), s1, 1)
    save_checkpoint(str(tmp_path), s2, 2)
    souped = restore_params_soup(
        [str(tmp_path / "ckpt_1"), str(tmp_path / "ckpt_2")], _tiny_state(2)
    )
    expected = 0.5 * (np.asarray(s1.params["w"]) + np.asarray(s2.params["w"]))
    np.testing.assert_allclose(np.asarray(souped["w"]), expected, atol=1e-6)


def test_misc_utils():
    from iterated_learning_for_vlm_tpu.utils.misc import (
        accuracy, count_params, mixup, strip_prefix,
    )

    p = {"a": jnp.zeros((3, 4)), "b": jnp.zeros((5,))}
    c = count_params(p)
    assert c["total"] == 17
    logits = np.array([[1.0, 0.5], [0.2, 0.9]])
    (a1,) = accuracy(logits, np.array([0, 1]), topk=(1,))
    assert a1 == 100.0
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    mixed, la, lb, lam = mixup(imgs, np.arange(4), 0.2, rng)
    assert mixed.shape == imgs.shape and 0 <= lam <= 1
    assert strip_prefix({"module.x": 1, "y": 2}) == {"x": 1, "y": 2}


def test_mask_tokens():
    from iterated_learning_for_vlm_tpu.data.mask_tokens import IGNORE_INDEX, mask_tokens

    rng = np.random.default_rng(0)
    tokens = np.full((8, 20), 5, np.int64)
    tokens[:, 0] = 100  # sot special
    masked, labels = mask_tokens(tokens, mask_token=99, special_tokens=[100],
                                 vocab_size=200, rng=rng)
    assert (masked[:, 0] == 100).all()  # specials untouched
    assert (labels[:, 0] == IGNORE_INDEX).all()
    changed = labels != IGNORE_INDEX
    assert 0 < changed.mean() < 0.4
    assert (labels[changed] == 5).all()


def test_memory_bank():
    from iterated_learning_for_vlm_tpu.models.memory_bank import (
        bank_init, bank_update, nearest_neighbour,
    )

    bank, ptr = bank_init(8, 4)
    batch = jnp.eye(4)
    bank, ptr = bank_update(bank, ptr, batch)
    assert int(ptr) == 4
    nn_out = nearest_neighbour(bank, jnp.asarray([[0.9, 0.1, 0, 0]]))
    np.testing.assert_allclose(np.asarray(nn_out), [[1, 0, 0, 0]], atol=1e-6)


def test_ema():
    from iterated_learning_for_vlm_tpu.train.ema import ema_init, ema_update

    p = {"w": jnp.ones((2,))}
    e = ema_init(p)
    e2 = ema_update(e, {"w": jnp.zeros((2,))}, decay=0.9)
    np.testing.assert_allclose(np.asarray(e2["w"]), [0.9, 0.9], atol=1e-6)


def test_async_roundtrip_and_k_times(tmp_path):
    """Async save overlaps the disk write; restore waits for in-flight
    writes, and the k_times archive lands on the 10x cadence."""
    from iterated_learning_for_vlm_tpu.train.checkpoint import wait_for_saves

    state = _tiny_state().replace(step=jnp.asarray(30, jnp.int32))
    save_checkpoint(str(tmp_path / "ck"), state, 30, k_times_every=30,
                    use_async=True)
    restored = restore_checkpoint(str(tmp_path / "ck" / "ckpt_30"), _tiny_state(1))
    assert int(restored.step) == 30
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))
    wait_for_saves()
    assert (tmp_path / "ck_k_times" / "ckpt_30").exists()


def test_modify_state_ignore_semantics():
    """Reference modify_state (misc.py:520-533): selective drops of a loaded
    checkpoint before finetuning."""
    from iterated_learning_for_vlm_tpu.train.checkpoint import modify_state

    template = _tiny_state(seed=1)
    restored = _tiny_state(seed=0).replace(
        step=jnp.asarray(99, jnp.int32),
        ema_buffer=jnp.asarray(7.0, jnp.float32),
        ema_clip_count=jnp.asarray(3.0, jnp.float32),
    )

    out = modify_state(restored, template,
                       {"key": ["optimizer", "last_iter", "ema"],
                        "model": ["space_dict"]})
    assert int(out.step) == 0
    assert float(out.ema_buffer) == pytest.approx(3.125)
    assert float(out.ema_clip_count) == 0.0
    # opt state back to fresh (template) moments
    flat_out = jax.tree_util.tree_leaves(out.opt_state)
    flat_tpl = jax.tree_util.tree_leaves(template.opt_state)
    for a, b in zip(flat_out, flat_tpl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # dropped param subtree re-initialized, kept subtree loaded
    np.testing.assert_array_equal(np.asarray(out.params["space_dict"]),
                                  np.asarray(template.params["space_dict"]))
    np.testing.assert_array_equal(np.asarray(out.params["w"]),
                                  np.asarray(restored.params["w"]))

    # no-ops leave everything loaded
    same = modify_state(restored, template, {})
    assert int(same.step) == 99
    with pytest.raises(KeyError):
        modify_state(restored, template, {"model": ["nope"]})
