"""Training-path window-overflow guard (VERDICT r3 item 6).

The windowed sparse-conv engine silently zeroes dropped neighbors in
fwd AND bwd (ops/sparse_conv_windowed.py); the reference's spconv never
drops pairs (spconv_ops.h:28-258). The train step surfaces the sown
diagnostic as losses["diag/window_overflow"], and MetricLogger hard-fails
on a nonzero count. CPU runs use the gather engine (no drops possible),
so the end-to-end trip is asserted at the logger/train-step plumbing
level here and by bench/eval's hard check on the chip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
import pytest

from bevfusion_tpu.runtime.train import TrainState, make_train_step
from bevfusion_tpu.utils.logging import MetricLogger


def test_metric_logger_raises_on_overflow(tmp_path):
    lg = MetricLogger(str(tmp_path), interval=1)
    lg.log(0, 0, 10, {"loss/total": 1.0, "diag/window_overflow": 0.0})
    with pytest.raises(RuntimeError, match="window overflow"):
        lg.log(0, 1, 10, {"loss/total": 1.0, "diag/window_overflow": 3.0})


class _SowingModel(nn.Module):
    """Minimal model that sows a window_overflow diagnostic exactly like
    SparseEncoder._forward_windowed does on the chip."""

    count: float = 0.0

    @nn.compact
    def __call__(self, batch, training=False):
        w = self.param("w", nn.initializers.ones, (4,))
        y = jnp.sum(batch["x"] * w)
        self.sow("intermediates", "window_overflow",
                 jnp.int32(self.count))
        return {"loss/obj": y * y}


@pytest.mark.parametrize("count,expect", [(0.0, 0.0), (7.0, 7.0)])
def test_train_step_surfaces_overflow_diagnostic(count, expect):
    model = _SowingModel(count=count)
    batch = {"x": jnp.ones((4,))}
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    tx = optax.sgd(1e-2)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"], batch_stats={},
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(make_train_step(model, tx))
    _, logs = step(state, batch)
    assert "diag/window_overflow" in logs
    assert float(logs["diag/window_overflow"]) == expect
