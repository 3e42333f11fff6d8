"""Shared evaluation driver: run a model over a val/test loader and hand
per-sample results to the dataset's evaluate methods.

Behavioral reference: mmdet3d/apis/train.py:99-120 (DistEvalHook runs
eval every epoch during training) and tools/test.py + apis/test.py
(single_gpu_test collects per-sample dicts of boxes_3d/scores_3d/
labels_3d or masks_bev for dataset.evaluate).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

__all__ = ["run_model_on_loader", "evaluate_dataset", "_find_overflow"]


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
                     out_dir: Optional[str] = None) -> Dict[str, float]:
    """One eval pass (the per-epoch DistEvalHook body): jit the eval
    forward once, collect results, dispatch to the dataset metric."""
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
    if metric == "map":
        return dataset.evaluate_map(results)
    return dataset.evaluate_detection(results, out_dir or "runs/eval")
