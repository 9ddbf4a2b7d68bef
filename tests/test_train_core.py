"""Loss / schedule / optimizer / freeze-mask unit tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iterated_learning_for_vlm_tpu.train.loss import clip_info_nce, clip_info_nce_sharded
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, adamw_update, build_wd_tree, clamp_logit_scale, clip_grads,
    param_category, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.schedule import cosine, scheduler_entry


# -- schedule ----------------------------------------------------------------
def _reference_cosine(step, base_lr, warmup_lr, min_lr, warmup_steps, max_iter, reset_steps):
    """Literal transcription of reference Cosine._get_new_lr (scheduler.py:245-255)."""
    step_ratio = (step - warmup_steps) / (max_iter - warmup_steps)
    target = min_lr + (warmup_lr - min_lr) * (1 + math.cos(math.pi * step_ratio)) / 2
    scale = target / base_lr
    if warmup_steps >= 2:
        if step < warmup_steps:
            t = (warmup_lr - base_lr) / (warmup_steps - 1) * (step - 1) + base_lr
            return t / base_lr * base_lr
        elif reset_steps > 0 and step % reset_steps < warmup_steps:
            s = step % reset_steps
            t = (warmup_lr - base_lr) / (warmup_steps - 1) * (s - 1) + base_lr
            return scale * (t / warmup_lr) * base_lr
    return scale * base_lr


def test_cosine_matches_reference_formula():
    kw = dict(base_lr=5e-5, warmup_lr=5e-4, min_lr=0.0, warmup_steps=500,
              max_iter=80000, reset_steps=6000)
    sched = cosine(**kw)
    for step in [1, 10, 499, 500, 501, 3000, 5999, 6000, 6001, 6250, 6499, 6500,
                 12000, 12345, 50000, 79999]:
        ours = float(sched(step))
        ref = _reference_cosine(step, **kw)
        assert ours == pytest.approx(ref, rel=1e-5), step


def test_scheduler_entry_yaml():
    cfg = {"type": "Cosine", "kwargs": {"base_lr": 5e-5, "warmup_lr": 5e-4,
           "min_lr": 0.0, "warmup_steps": 500, "max_iter": 80000,
           "last_iter": 0, "reset_steps": 6000}}
    sched = scheduler_entry(cfg)
    assert float(sched(1)) == pytest.approx(5e-5, rel=1e-6)
    assert float(sched(500)) == pytest.approx(
        _reference_cosine(500, 5e-5, 5e-4, 0.0, 500, 80000, 6000), rel=1e-5)


def test_scheduler_entry_epoch_types():
    """StepEpoch/CosineEpoch convert epoch kwargs by max_iter/max_epoch
    (reference lr_scheduler/__init__.py:4-21)."""
    cfg = {"type": "StepEpoch", "kwargs": {
        "base_lr": 1e-4, "warmup_lr": 1e-3, "warmup_epoch": 1,
        "lr_epochs": [3, 6], "lr_mults": [0.1, 0.1],
        "max_iter": 1000, "max_epoch": 10}}
    sched = scheduler_entry(cfg)
    # converted: warmup_steps=100, lr_steps=[300, 600]
    direct = scheduler_entry({"type": "Step", "kwargs": {
        "base_lr": 1e-4, "warmup_lr": 1e-3, "warmup_steps": 100,
        "lr_steps": [300, 600], "lr_mults": [0.1, 0.1], "max_iter": 1000}})
    for s in (0, 50, 100, 299, 300, 599, 600, 999):
        assert float(sched(s)) == pytest.approx(float(direct(s)), rel=1e-6)
    # warmup floor of 2 steps (reference max(round(...), 2))
    from iterated_learning_for_vlm_tpu.train.schedule import epoch_to_iter

    kw = epoch_to_iter({"warmup_epoch": 0.0001, "max_iter": 100, "max_epoch": 10})
    assert kw["warmup_steps"] == 2


# -- loss --------------------------------------------------------------------
def _embeds(b=16, d=8, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(b, d).astype(np.float32)
    txt = rng.randn(b, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


def _naive_infonce(img, txt, scale):
    """Direct restatement of reference ClipInfoCELoss on the global batch."""
    logits_i = img @ txt.T * scale
    logits_t = txt @ img.T * scale
    labels = np.arange(len(img))

    def xent(lg):
        lg = lg - lg.max(-1, keepdims=True)
        logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -logp[np.arange(len(lg)), labels].mean()

    return 0.5 * (xent(logits_i) + xent(logits_t))


def test_global_loss_matches_naive():
    img, txt = _embeds()
    loss, metrics = clip_info_nce(jnp.asarray(img), jnp.asarray(txt), 10.0)
    assert float(loss) == pytest.approx(_naive_infonce(img, txt, 10.0), rel=1e-5)
    assert 0 <= float(metrics["acc1"]) <= 100


def test_sharded_loss_matches_global():
    """The shard_map formulation (all_gather + rank-offset labels) must equal
    the global-math formulation — this pins the reference label math
    (loss.py:42) at world_size 8."""
    from jax import shard_map

    img, txt = _embeds(b=32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def f(i, t):
        loss, m = clip_info_nce_sharded(i, t, 10.0, axis_name="data")
        return loss, m["acc1"]

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), P()),
    )
    loss_sh, acc_sh = sharded(jnp.asarray(img), jnp.asarray(txt))
    loss_gl, m_gl = clip_info_nce(jnp.asarray(img), jnp.asarray(txt), 10.0)
    assert float(loss_sh) == pytest.approx(float(loss_gl), rel=1e-5)
    assert float(acc_sh) == pytest.approx(float(m_gl["acc1"]), abs=1e-3)


@pytest.mark.slow  # re-tiered r4 (~30s); test_sharded_loss_matches_global keeps the fast-lane coverage
def test_sharded_loss_grads_match_global():
    from jax import shard_map

    img, txt = _embeds(b=16)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def g_global(i, t):
        return clip_info_nce(i, t, 10.0)[0]

    def g_shard(i, t):
        f = shard_map(
            lambda a, b: clip_info_nce_sharded(a, b, 10.0, axis_name="data")[0],
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        )
        return f(i, t)

    gi1, gt1 = jax.grad(g_global, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))
    gi2, gt2 = jax.grad(g_shard, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-6)


# -- optimizer ---------------------------------------------------------------
def _toy_params():
    return {
        "visual": {
            "conv1": {"kernel": jnp.ones((2, 2, 3, 4))},
            "ln_pre": {"norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}},
            "proj": jnp.ones((4, 2)),
        },
        "text": {"text_projection": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros((2,))}},
        "logit_scale": jnp.asarray([2.0]),
        "space_dict": jnp.ones((8, 2)),
    }


def test_param_categories():
    assert param_category(("visual", "ln_pre", "norm", "scale")) == "ln_w"
    assert param_category(("visual", "ln_pre", "norm", "bias")) == "ln_b"
    assert param_category(("text", "text_projection", "bias")) == "bias"
    assert param_category(("logit_scale",)) == "logit_scale"
    assert param_category(("space_dict",)) == "space_dict"
    assert param_category(("visual", "conv1", "kernel")) == "default"


def test_wd_tree_reference_pconfig():
    pconfig = {"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
               "bias": {"weight_decay": 0}, "logit_scale": {"weight_decay": 0}}
    params = _toy_params()
    wd = build_wd_tree(params, 0.1, pconfig)
    assert wd["visual"]["ln_pre"]["norm"]["scale"] == 0
    assert wd["text"]["text_projection"]["bias"] == 0
    assert wd["logit_scale"] == 0
    assert wd["visual"]["conv1"]["kernel"] == 0.1
    assert wd["space_dict"] == 0.1  # codebook gets default decay (reference)


def test_adamw_freeze_semantics():
    params = _toy_params()
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    wd = build_wd_tree(params, 0.0, {})
    state = adamw_init(params)
    # conv1 always frozen; also freeze vision group
    mask = trainable_mask_tree(params, frozenset({"vision"}))
    new_p, new_s = adamw_update(grads, state, params, lr=0.1, wd_tree=wd, trainable=mask)
    # frozen leaves identical, moments untouched, counts zero
    np.testing.assert_array_equal(new_p["visual"]["proj"], params["visual"]["proj"])
    np.testing.assert_array_equal(new_s["mu"]["visual"]["proj"], 0.0)
    assert float(new_s["count"]["visual"]["proj"]) == 0.0
    # trainable leaves moved
    assert not np.allclose(new_p["text"]["text_projection"]["kernel"],
                           params["text"]["text_projection"]["kernel"])
    assert float(new_s["count"]["text"]["text_projection"]["kernel"]) == 1.0


def test_adamw_matches_optax_when_unfrozen():
    import optax

    params = {"w": jnp.linspace(-1, 1, 12).reshape(3, 4), "b": jnp.zeros((4,))}
    grads = {"w": jnp.ones((3, 4)) * 0.3, "b": jnp.ones((4,)) * -0.2}
    wd = {"w": 0.1, "b": 0.0}
    mask = {"w": jnp.ones(()), "b": jnp.ones(())}

    state = adamw_init(params)
    p1, s1 = adamw_update(grads, state, params, lr=1e-3, wd_tree=wd, trainable=mask,
                          b1=0.9, b2=0.98, eps=1e-8)
    p1, s1 = adamw_update(grads, s1, p1, lr=1e-3, wd_tree=wd, trainable=mask,
                          b1=0.9, b2=0.98, eps=1e-8)

    tx = optax.adamw(1e-3, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.1,
                     mask={"w": True, "b": False})
    ostate = tx.init(params)
    p2 = params
    for _ in range(2):
        upd, ostate = tx.update(jax.tree.map(lambda g: g, grads), ostate, p2)
        p2 = optax.apply_updates(p2, upd)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1["b"]), np.asarray(p2["b"]), atol=1e-6)


def test_grad_clip_modes():
    grads = {"a": jnp.asarray([3.0, -4.0]), "logit_scale": jnp.asarray([10.0])}
    clipped = clip_grads(grads, "norm", 1.0)
    total = np.sqrt(sum(np.sum(np.square(np.asarray(g))) for g in jax.tree.leaves(clipped)))
    assert total == pytest.approx(1.0, rel=1e-3)
    clipped = clip_grads(grads, "value", 2.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [2.0, -2.0])
    clipped = clip_grads(grads, "logit_scale_grad", 1.0)
    np.testing.assert_allclose(np.asarray(clipped["logit_scale"]), [1.0])
    np.testing.assert_allclose(np.asarray(clipped["a"]), [3.0, -4.0])


def test_clamp_logit_scale():
    params = {"logit_scale": jnp.asarray([7.5]), "w": jnp.ones((2,))}
    out = clamp_logit_scale(params, "logit_scale_param_value", 3.0, 6.0)
    np.testing.assert_allclose(np.asarray(out["logit_scale"]), [6.0])
    out = clamp_logit_scale({"logit_scale": jnp.asarray([1.0]), "w": jnp.ones((2,))},
                            "logit_scale_param_value", 3.0, 6.0)
    np.testing.assert_allclose(np.asarray(out["logit_scale"]), [3.0])


def test_lars_update():
    from iterated_learning_for_vlm_tpu.train.optim import lars_init, lars_update

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    wd = {"w": 0.0, "b": 0.0}
    mask = {"w": jnp.ones(()), "b": jnp.zeros(())}  # freeze b
    state = lars_init(params)
    p1, s1 = lars_update(grads, state, params, lr=0.1, wd_tree=wd, trainable=mask)
    assert not np.allclose(np.asarray(p1["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(p1["b"]), np.asarray(params["b"]))
    # trust ratio: update magnitude scaled by ||w||/||g||
    p2, s2 = lars_update(grads, s1, p1, lr=0.1, wd_tree=wd, trainable=mask)
    assert np.isfinite(np.asarray(p2["w"])).all()


def test_simsiam_minimize_variant():
    from iterated_learning_for_vlm_tpu.train.loss import simsiam_loss

    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(4, 3, 8).astype(np.float32))
    z = jnp.asarray(rng.randn(4, 3, 8).astype(np.float32))
    loss = simsiam_loss(p, z, p, z, minimize_loss=True)
    assert -1.0 <= float(loss) <= 1.0


def test_best_composition_score_tracking(tmp_path, monkeypatch):
    """Best-score dict updates on improvement, holds on a >0.003 mean drop
    (reference train_solver.py:657-667 gate, whose flag the caller ignores)."""
    import logging
    from types import SimpleNamespace

    import iterated_learning_for_vlm_tpu.eval.encode as encode_mod
    import iterated_learning_for_vlm_tpu.eval.sugar_crepe as sc_mod
    from iterated_learning_for_vlm_tpu.train.solver import Solver
    from iterated_learning_for_vlm_tpu.utils.logging import MetricsWriter

    monkeypatch.setattr(encode_mod, "JitEncoder", lambda *a, **k: None)
    scores = [{"add_obj": 0.5, "swap_att": 0.5},
              {"add_obj": 0.4, "swap_att": 0.4},
              {"add_obj": 0.6, "swap_att": 0.6}]
    it = iter(scores)
    monkeypatch.setattr(sc_mod, "evaluate_sugar_crepe", lambda *a, **k: next(it))

    solver = object.__new__(Solver)
    solver.config = SimpleNamespace(data={"test": {
        "sc_data_root": str(tmp_path), "sc_image_root": str(tmp_path)}})
    solver.logger = logging.getLogger("test_best_score")
    solver.metrics_writer = MetricsWriter(str(tmp_path / "m.jsonl"), enabled=False)
    solver.model, solver.is_fdt, solver.tokenizer = None, False, None
    solver.state = SimpleNamespace(params=None)

    assert Solver.evaluate(solver, 1) == scores[0]
    assert solver.best_composition_score == scores[0]
    Solver.evaluate(solver, 2)  # mean drops 0.1 > 0.003 -> best held
    assert solver.best_composition_score == scores[0]
    Solver.evaluate(solver, 3)  # improvement -> best replaced
    assert solver.best_composition_score == scores[2]


def test_adamw_bf16_moments_track_fp32():
    """optimizer.moment_dtype=bfloat16: moments stay compressed in the state,
    math runs fp32, and the trajectory tracks the fp32-moment run closely."""
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (16, 8)) * 0.1, "b": jnp.zeros((8,))}
    wd = {"w": 0.1, "b": 0.0}
    mask = {"w": jnp.ones(()), "b": jnp.ones(())}

    s32 = adamw_init(params)
    s16 = adamw_init(params, jnp.bfloat16)
    assert s16["mu"]["w"].dtype == jnp.bfloat16
    assert s16["nu"]["w"].dtype == jnp.bfloat16

    p32, p16 = params, params
    for i in range(20):
        g = {"w": jax.random.normal(jax.random.fold_in(key, i), (16, 8)) * 0.05,
             "b": jnp.ones((8,)) * 0.01}
        p32, s32 = adamw_update(g, s32, p32, lr=1e-3, wd_tree=wd, trainable=mask)
        p16, s16 = adamw_update(g, s16, p16, lr=1e-3, wd_tree=wd, trainable=mask)

    # compressed state keeps its dtype through updates (checkpoint-stable)
    assert s16["mu"]["w"].dtype == jnp.bfloat16
    assert s16["nu"]["w"].dtype == jnp.bfloat16
    # params remain fp32 and within moment-rounding noise of the fp32 run
    assert p16["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               atol=5e-4, rtol=0)
    # and both actually moved
    assert not np.allclose(np.asarray(p32["w"]), np.asarray(params["w"]))


def test_stochastic_round_bf16_unbiased_accumulation():
    """The motivating failure: accumulating c*g onto a bf16 running average
    with nearest-rounding freezes once the increment falls under ulp/2;
    stochastic rounding keeps the expectation moving."""
    from iterated_learning_for_vlm_tpu.train.optim import stochastic_round_bf16

    n = 4096
    acc_sr = jnp.full((n,), 1.0, jnp.bfloat16)
    acc_rn = jnp.full((n,), 1.0, jnp.bfloat16)
    inc = 1e-4  # ~1/39 of bf16 ulp at 1.0 (ulp = 2^-8 * 2 = 0.0078)
    for step in range(400):
        salt = jnp.asarray(step, jnp.uint32)
        acc_sr = stochastic_round_bf16(acc_sr.astype(jnp.float32) + inc, salt)
        acc_rn = (acc_rn.astype(jnp.float32) + inc).astype(jnp.bfloat16)
    # nearest: swamped, never moves
    np.testing.assert_array_equal(np.asarray(acc_rn, np.float32), 1.0)
    # SR: mean tracks the true sum 1.0 + 400*1e-4 = 1.04 within a few ulp/sqrt(n)
    mean_sr = float(np.mean(np.asarray(acc_sr, np.float32)))
    assert abs(mean_sr - 1.04) < 2e-3, mean_sr


def test_stochastic_round_bf16_deterministic_and_exact():
    from iterated_learning_for_vlm_tpu.train.optim import stochastic_round_bf16

    x = jnp.asarray(np.random.default_rng(0).standard_normal(512), jnp.float32)
    salt = jnp.asarray(7, jnp.uint32)
    a = stochastic_round_bf16(x, salt)
    b = stochastic_round_bf16(x, salt)
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
    # values already representable in bf16 pass through unchanged
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(stochastic_round_bf16(xb, salt), np.float32),
        np.asarray(xb.astype(jnp.bfloat16), np.float32))
    # rounded result is always one of the two bf16 neighbours
    lo = x.astype(jnp.bfloat16).astype(np.float32)
    out = np.asarray(a, np.float32)
    neighbour = np.abs(out - np.asarray(lo)) <= np.abs(np.asarray(xb) * 2**-7) + 1e-30
    assert neighbour.all()


def test_adamw_bf16_sr_frozen_leaves_stay_exact():
    """SR must not perturb frozen leaves (mask 0): bf16 values are exact in
    fp32, so noise below the mantissa cannot carry."""
    params = _toy_params()
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    wd = build_wd_tree(params, 0.0, {})
    state = adamw_init(params, jnp.bfloat16)
    mask = trainable_mask_tree(params, frozenset({"vision"}))
    for _ in range(3):
        _, state = adamw_update(grads, state, params, lr=0.1, wd_tree=wd,
                                trainable=mask, moment_rounding="stochastic")
    np.testing.assert_array_equal(
        np.asarray(state["mu"]["visual"]["proj"], np.float32), 0.0)
    assert float(state["count"]["visual"]["proj"]) == 0.0
