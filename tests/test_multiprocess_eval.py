"""Multi-process eval, end-to-end through the tools/test.py path:
sharded DataLoader -> jitted infer -> collect_results_cpu merge ->
dataset metric on rank 0 (reference multi_gpu_test + collect_results,
tools/test.py:198-226). Two ranks run in one process (rank 1 writes its
part first; rank 0 merges), exercising exactly the evaluate_dataset
code the CLIs call with rank=jax.process_index().
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from bevfusion_tpu.data.loader import DataLoader
from bevfusion_tpu.runtime.eval import evaluate_dataset


class _StubSegDataset:
    """8 samples; masks encode the sample index so the merged order is
    checkable. evaluate_map returns the fraction of results whose mask
    decodes to its dataset position (1.0 == perfect rank interleave)."""

    def __init__(self, n=8, hw=8):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # "img" is on the collate whitelist (loader._BATCH_KEYS)
        x = np.full((self.hw, self.hw, 1), float(i), np.float32)
        return {"img": x, "gt_masks_bev": np.zeros((1, self.hw, self.hw), bool)}

    def evaluate_map(self, results):
        assert len(results) == self.n, len(results)
        ok = [int(round(float(r["masks_bev"][0, 0, 0]))) == i
              for i, r in enumerate(results)]
        return {"order_ok": float(np.mean(ok)), "n": float(len(results))}


class _StubModel(nn.Module):
    @nn.compact
    def __call__(self, batch, training=False):
        # passthrough "segmentation": masks_bev [B, H, W, C=1]
        self.param("w", nn.initializers.ones, (1,))
        return {"masks_bev": batch["img"]}


def test_evaluate_dataset_two_rank_merge(tmp_path):
    ds = _StubSegDataset()
    model = _StubModel()
    variables = model.init(jax.random.PRNGKey(0),
                           {"img": jnp.zeros((1, 8, 8, 1))})
    world = 2
    tmpdir = str(tmp_path / "parts")

    # rank 1 first: evaluates its shard, writes its part, returns None
    loader1 = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1,
                         drop_last=False, num_shards=world, shard_id=1)
    out1 = evaluate_dataset(model, variables, ds, loader1, metric="map",
                            rank=1, world=world, tmpdir=tmpdir)
    assert out1 is None

    # rank 0: evaluates its shard, merges both parts, runs the metric
    loader0 = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1,
                         drop_last=False, num_shards=world, shard_id=0)
    metrics = evaluate_dataset(model, variables, ds, loader0, metric="map",
                               rank=0, world=world, tmpdir=tmpdir)
    assert metrics is not None
    assert metrics["n"] == len(ds)
    assert metrics["order_ok"] == 1.0  # dataset order fully restored
