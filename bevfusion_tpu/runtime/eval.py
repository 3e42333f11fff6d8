"""Shared evaluation driver: run a model over a val/test loader and hand
per-sample results to the dataset's evaluate methods.

Behavioral reference: mmdet3d/apis/train.py:99-120 (DistEvalHook runs
eval every epoch during training) and tools/test.py + apis/test.py
(single_gpu_test collects per-sample dicts of boxes_3d/scores_3d/
labels_3d or masks_bev for dataset.evaluate).
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Callable, Dict, List, Optional

__all__ = ["run_model_on_loader", "evaluate_dataset", "_find_overflow",
           "shard_indices", "collect_results_cpu"]


def shard_indices(n: int, rank: int, world: int) -> range:
    """Round-robin dataset shard for one eval process — the reference's
    DistributedSampler(shuffle=False) split driven by multi_gpu_test
    (tools/test.py:198-203): rank r evaluates samples r, r+world, ..."""
    return range(rank, n, world)


def collect_results_cpu(result_part: List[Any], size: int, tmpdir: str,
                        rank: int, world: int,
                        timeout: float = 600.0) -> Optional[List[Any]]:
    """Gather per-rank result lists through a shared directory.

    Mirrors mmdet's collect_results_cpu (used by multi_gpu_test,
    tools/test.py:203): every rank pickles its part, rank 0 waits for
    all parts, interleaves them back into dataset order (parts come
    from the round-robin shard_indices split) and truncates to `size`.
    Non-zero ranks return None. Writes are atomic (tmp + rename) so a
    partially-written part is never loaded. In a jax.distributed
    deployment rank/world come from jax.process_index()/count() and
    tmpdir sits on shared storage.
    """
    os.makedirs(tmpdir, exist_ok=True)
    final = os.path.join(tmpdir, f"part_{rank}.pkl")
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(result_part, f)
    os.replace(tmp, final)
    if rank != 0:
        return None
    parts: List[List[Any]] = []
    deadline = time.time() + timeout
    for r in range(world):
        path = os.path.join(tmpdir, f"part_{r}.pkl")
        while not os.path.exists(path):
            if time.time() > deadline:
                raise TimeoutError(f"eval rank {r} never produced {path}")
            time.sleep(0.05)
        with open(path, "rb") as f:
            parts.append(pickle.load(f))
    ordered: List[Any] = []
    for i in range(max((len(p) for p in parts), default=0)):
        for p in parts:
            if i < len(p):
                ordered.append(p[i])
    return ordered[:size]


def _find_overflow(tree):
    """Sum every `window_overflow` leaf sown by sparse encoders (flax
    sows tuples of values per call site); None if the model has none."""
    import jax.numpy as jnp

    found = []

    def visit(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "window_overflow":
                    found.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    visit(v)

    visit(tree)
    if not found:
        return None
    return sum(jnp.sum(f) for f in found)


def run_model_on_loader(infer: Callable, loader) -> List[Dict[str, Any]]:
    """Run a jitted eval-forward over a loader, converting fixed-shape
    masked outputs to the reference's per-sample result-dict list."""
    import jax
    import jax.numpy as jnp

    results: List[Dict[str, Any]] = []
    for np_batch in loader:
        gt_masks = np_batch.pop("gt_masks_bev", None)
        np_batch.pop("metas", None)
        batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
        out = jax.device_get(infer(batch))
        ovf = out.pop("window_overflow", None)
        if ovf is not None and int(ovf) != 0:
            # dropped sparse-conv neighbors silently zero conv
            # contributions — hard-fail rather than degrade accuracy
            # (raise window_slack / site caps in the encoder config)
            raise RuntimeError(
                f"sparse-conv window overflow: {int(ovf)} neighbors "
                "dropped (increase SparseEncoder.window_slack)")
        B = next(iter(batch.values())).shape[0]
        for b in range(B):
            res: Dict[str, Any] = {}
            if "boxes" in out:
                m = out["boxes"]["mask"][b]
                res["boxes_3d"] = out["boxes"]["bboxes"][b][m]
                res["scores_3d"] = out["boxes"]["scores"][b][m]
                res["labels_3d"] = out["boxes"]["labels"][b][m]
            if "masks_bev" in out:
                res["masks_bev"] = out["masks_bev"][b].transpose(2, 0, 1)
                if gt_masks is not None:
                    res["gt_masks_bev"] = gt_masks[b]
            results.append(res)
    return results


def evaluate_dataset(model, variables, dataset, loader, metric: str = "bbox",
                     out_dir: Optional[str] = None, rank: int = 0,
                     world: int = 1,
                     tmpdir: Optional[str] = None) -> Optional[Dict[str, float]]:
    """One eval pass (the per-epoch DistEvalHook body): jit the eval
    forward once, collect results, dispatch to the dataset metric.

    Multi-process: pass rank/world (jax.process_index()/count()) and a
    shared tmpdir; each process runs its loader shard (built over
    shard_indices) and rank 0 merges + evaluates (multi_gpu_test
    semantics, tools/test.py:198-226). Non-zero ranks return None."""
    import jax

    @jax.jit
    def infer(batch):
        out, state = model.apply(
            variables, batch, training=False,
            mutable=["batch_stats", "intermediates"])
        inter = state.get("intermediates", {})
        ovf = _find_overflow(inter)
        if ovf is not None:
            out = dict(out)
            out["window_overflow"] = ovf
        return out

    results = run_model_on_loader(infer, loader)
    if world > 1:
        results = collect_results_cpu(
            results, len(dataset), tmpdir or (out_dir or "runs/eval") + "/parts",
            rank, world)
        if results is None:
            return None
    if metric == "map":
        return dataset.evaluate_map(results)
    return dataset.evaluate_detection(results, out_dir or "runs/eval")
