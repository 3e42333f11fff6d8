"""Render GT / predictions (reference: tools/visualize.py).
  python tools/visualize.py <config> --checkpoint ckpt --split val \
      --mode pred --out-dir viz/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mode", default="gt", choices=["gt", "pred"])
    ap.add_argument("--split", default="val", choices=["train", "val", "test"])
    ap.add_argument("--out-dir", default="viz")
    ap.add_argument("--max-samples", type=int, default=20)
    ap.add_argument("--bbox-score", type=float, default=0.25)
    args = ap.parse_args()

    import numpy as np

    from bevfusion_tpu.config import load_config
    from bevfusion_tpu.data import build_dataset
    from bevfusion_tpu.utils.visualize import (
        visualize_camera, visualize_lidar, visualize_map,
    )

    cfg = load_config(args.config)
    dataset = build_dataset(cfg.data[args.split])

    infer = None
    if args.mode == "pred":
        import jax
        import jax.numpy as jnp

        from bevfusion_tpu.models import build_model
        from bevfusion_tpu.runtime.checkpoint import restore_checkpoint

        model = build_model(cfg.model)
        state = restore_checkpoint(args.checkpoint)
        variables = {"params": state["params"] if "params" in state else state,
                     "batch_stats": state.get("batch_stats", {})}

        @jax.jit
        def _infer(batch):
            out, _ = model.apply(variables, batch, training=False,
                                 mutable=["batch_stats"])
            return out

        def infer(sample):
            batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                     if k not in ("metas",)}
            return jax.device_get(_infer(batch))

    classes = list(cfg.object_classes)
    for idx in range(min(args.max_samples, len(dataset))):
        sample = dataset[idx]
        name = f"sample{idx:05d}"
        if args.mode == "gt":
            boxes = sample.get("gt_boxes")
            labels = sample.get("gt_labels")
            if boxes is not None and "gt_valid" in sample:
                m = sample["gt_valid"]
                boxes, labels = boxes[m], labels[m]
        else:
            out = infer(sample)
            b = out["boxes"]
            m = b["mask"][0] & (b["scores"][0] >= args.bbox_score)
            boxes, labels = b["bboxes"][0][m], b["labels"][0][m]

        pts = sample["points"][sample["points_mask"]] if "points_mask" in sample else sample["points"]
        visualize_lidar(
            os.path.join(args.out_dir, f"{name}/lidar.png"), pts,
            boxes, labels, classes,
            xlim=(cfg.point_cloud_range[0], cfg.point_cloud_range[3]),
            ylim=(cfg.point_cloud_range[1], cfg.point_cloud_range[4]),
        )
        if "img" in sample:
            for c in range(sample["img"].shape[0]):
                im = sample["img"][c]
                im = (im - im.min()) / max(im.max() - im.min(), 1e-6) * 255
                visualize_camera(
                    os.path.join(args.out_dir, f"{name}/cam{c}.png"), im,
                    boxes, labels, sample["lidar2image"][c], classes,
                )
        if "gt_masks_bev" in sample and args.mode == "gt":
            visualize_map(os.path.join(args.out_dir, f"{name}/map.png"),
                          np.asarray(sample["gt_masks_bev"]),
                          list(cfg.map_classes))
        print("rendered", name)


if __name__ == "__main__":
    main()
