"""Training stack tests: optimizer construction, schedules, train step."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.runtime.train import (
    TrainState, build_lr_schedule, build_optimizer, make_train_step,
)


def test_lr_schedules():
    cyc = build_lr_schedule({"policy": "cyclic", "target_ratio": 5.0,
                             "step_ratio_up": 0.4}, 1e-4, 100)
    vals = [float(cyc(i)) for i in (0, 40, 99)]
    assert vals[1] > vals[0]  # ramps up to the peak
    assert vals[2] < vals[1]  # decays after

    cos = build_lr_schedule({"policy": "CosineAnnealing", "warmup": "linear",
                             "warmup_iters": 10, "warmup_ratio": 0.33,
                             "min_lr_ratio": 1e-3}, 2e-4, 100)
    assert float(cos(0)) < float(cos(10))  # warmup
    assert abs(float(cos(10)) - 2e-4) < 1e-6
    assert float(cos(99)) < 1e-5


def test_paramwise_multipliers_and_clip():
    params = {
        "encoders_camera_backbone": {"w": jnp.ones((4,))},
        "head": {"w": jnp.ones((4,)),
                 "relative_position_bias_table": jnp.ones((4,))},
    }
    cfg = {
        "type": "AdamW", "lr": 1e-3, "weight_decay": 0.01,
        "paramwise_cfg": {"custom_keys": {
            "encoders.camera.backbone": {"lr_mult": 0.1},
            "relative_position_bias_table": {"decay_mult": 0},
        }},
    }
    sched = build_lr_schedule(None, 1e-3, 10)
    tx = build_optimizer(cfg, sched, params, grad_clip={"max_norm": 35})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u_backbone = float(jnp.abs(updates["encoders_camera_backbone"]["w"][0]))
    u_head = float(jnp.abs(updates["head"]["w"][0]))
    assert u_backbone < u_head * 0.2  # lr_mult 0.1 applied


@pytest.mark.slow
def test_train_step_two_iterations_decrease_loss():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_bevfusion_model import make_batch, tiny_fused_config

    from bevfusion_tpu.models import build_model

    model = build_model(tiny_fused_config())
    batch = make_batch(B=1, N=2, P=256, G=3)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=True)
    )(batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    sched = build_lr_schedule({"policy": "cyclic"}, 1e-3, 10)
    tx = build_optimizer({"type": "AdamW", "lr": 1e-3, "weight_decay": 0.01},
                         sched, params, grad_clip={"max_norm": 35})
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=bs, opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for _ in range(4):
        state, logs = step(state, batch)
        losses.append(float(np.asarray(logs["loss/total"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_cyclic_momentum_schedule():
    """Reference registers a cyclic momentum hook alongside the cyclic
    lr hook (mmdet3d/apis/train.py:92-98; momentum_config in
    configs/nuscenes/det/transfusion/secfpn/default.yaml:46). b1 must
    dip during the lr up-phase and anneal back to base."""
    import numpy as np
    from bevfusion_tpu.runtime.train import build_momentum_schedule

    total = 100
    sched = build_momentum_schedule({"policy": "cyclic"}, 0.9, total)
    vals = np.array([float(sched(t)) for t in range(total + 1)])
    assert abs(vals[0] - 0.9) < 1e-6
    # dip bottom at the lr peak (step_ratio_up=0.4): 0.9 * 0.85/0.95
    assert abs(vals[40] - 0.9 * 0.85 / 0.95) < 1e-3
    assert abs(vals[-1] - 0.9) < 1e-3
    assert vals.min() >= 0.9 * 0.85 / 0.95 - 1e-6

    # fixed/absent configs -> None (constant b1 path)
    assert build_momentum_schedule(None, 0.9, total) is None
    assert build_momentum_schedule({"policy": "fixed"}, 0.9, total) is None


def test_momentum_schedule_drives_optimizer():
    """inject_hyperparams(b1=schedule) must produce a different update
    trajectory than constant b1 and keep the opt_state structure sane."""
    import jax
    import jax.numpy as jnp
    from bevfusion_tpu.runtime.train import (
        build_momentum_schedule, build_optimizer,
    )

    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    sched = lambda t: 1e-2
    msched = build_momentum_schedule({"policy": "cyclic"}, 0.9, 10)
    tx = build_optimizer({"lr": 1e-2, "weight_decay": 0.0}, sched, params,
                         momentum_schedule=msched)
    st = tx.init(params)
    g = {"w": jnp.ones((3,)), "b": jnp.ones((2,))}
    for _ in range(3):
        up, st = tx.update(g, st, params)
    assert jnp.all(jnp.isfinite(up["w"]))
