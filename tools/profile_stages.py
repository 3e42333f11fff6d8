"""Per-stage latency profile of the flagship fused C+L detector.

The TPU analogue of the reference's benchmark harness
(tools/benchmark.py:58-87) but stage-resolved: each pipeline stage is
jitted separately and timed with serialized device runs + one scalar
fetch (on the tunneled axon platform block_until_ready does not
synchronize; a scalar fetch does, and queued runs serialize).

Usage: python tools/profile_stages.py [--iters 20] [--points 120000]
Prints a markdown table for PERFORMANCE.md.

Per-stage jit loses inter-stage fusion, so the sum exceeds the fused
whole-model time — use this for *ranking* bottlenecks, bench.py for the
headline number.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--lidar", default="scan", choices=["scan", "uniform"])
    ap.add_argument("--flops", action="store_true",
                    help="also report per-stage XLA cost-analysis FLOPs, "
                         "achieved TFLOP/s and MFU (vs the measured "
                         "~70 TFLOP/s bf16 peak of this chip) — the "
                         "reference's flops_counter equivalent "
                         "(mmdet3d/models/utils/flops_counter.py)")
    args = ap.parse_args()
    PEAK_TFLOPS = 70.0  # measured large-matmul bf16 rate (PERFORMANCE.md)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.runtime.flagship import build_flagship, synthetic_batch
    from bevfusion_tpu.config import load_config
    from bevfusion_tpu.models import build_model
    from bevfusion_tpu.runtime.flagship import FLAGSHIP_CONFIG

    cfg = load_config(FLAGSHIP_CONFIG)
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, B=1, num_points=args.points,
                            lidar=args.lidar)
    from bevfusion_tpu.runtime.flagship import add_pool_lut
    batch = add_pool_lut(cfg, batch)  # the bench/deployment pool path
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=False)
    )(batch)

    rows = []

    def timed(name, fn, *fargs, iters=args.iters):
        @jax.jit
        def f(*a):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            chk = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                      if hasattr(l, "dtype"))
            return out, chk

        out, chk = f(*fargs)          # compile
        float(np.asarray(chk))
        fl = None
        if args.flops:
            cost = f.lower(*fargs).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0)) if cost else 0.0
        for _ in range(3):            # warmup
            out, chk = f(*fargs)
        float(np.asarray(chk))
        t0 = time.perf_counter()
        for _ in range(iters):
            out, chk = f(*fargs)
        float(np.asarray(chk))
        dt = (time.perf_counter() - t0) / iters * 1e3
        rows.append((name, dt, fl))
        print(f"{name:34s} {dt:8.2f} ms", flush=True)
        return out

    mats = {k: batch[k] for k in (
        "camera2ego", "lidar2ego", "lidar2camera", "lidar2image",
        "camera_intrinsics", "camera2lidar", "img_aug_matrix",
        "lidar_aug_matrix", "pool_lut") if k in batch}

    # ---- camera branch -------------------------------------------------
    def cam_backbone(m, img):
        B, N, H, W, C = img.shape
        return m.camera_backbone(img.reshape(B * N, H, W, C).astype(m.dtype),
                                 training=False)

    feats = timed("camera/backbone (Swin-T)",
                  lambda img: model.apply(variables, img,
                                          method=cam_backbone,
                                          mutable=["batch_stats"])[0],
                  batch["img"])

    def cam_neck(m, f):
        out = m.camera_neck(f, training=False)
        return out[0] if isinstance(out, (list, tuple)) else out

    neck = timed("camera/neck (GeneralizedLSSFPN)",
                 lambda f: model.apply(variables, f, method=cam_neck,
                                       mutable=["batch_stats"])[0],
                 feats)

    B = batch["img"].shape[0]
    N = batch["img"].shape[1]
    fH, fW, fC = neck.shape[1:]
    neck_r = neck.reshape(B, N, fH, fW, fC)

    def vtrans(m, f, pts, msk):
        return m.camera_vtransform(f, pts, msk, mats, training=False)

    cam_bev = timed("camera/vtransform (DepthLSS+pool)",
                    lambda f, p, mk: model.apply(
                        variables, f, p, mk, method=vtrans,
                        mutable=["batch_stats"])[0],
                    neck_r, batch["points"], batch["points_mask"])

    # ---- lidar branch --------------------------------------------------
    def vox(m, pts, msk):
        return m.lidar_voxelize(pts, msk, training=False)

    vout = timed("lidar/voxelize",
                 lambda p, mk: model.apply(variables, p, mk, method=vox,
                                           mutable=["batch_stats"])[0],
                 batch["points"], batch["points_mask"])
    vfeats, vcoords, vsizes, vmask = vout
    M = vfeats.shape[0] // B
    coords_xyz = vcoords.reshape(B, M, 4)[..., 1:]
    vmask_r = vmask.reshape(B, M)
    vfeats_r = vfeats.reshape(B, M, -1)

    def lbb(m, f, c, mk):
        return m.lidar_backbone(f.astype(m.dtype), c, mk, training=False)

    lidar_bev = timed("lidar/sparse_encoder",
                      lambda f, c, mk: model.apply(
                          variables, f, c, mk, method=lbb,
                          mutable=["batch_stats", "intermediates"])[0],
                      vfeats_r, coords_xyz, vmask_r)

    # ---- fusion + decoder + heads --------------------------------------
    def fuse(m, a, b_):
        return m.fuser_module([a, b_], training=False)

    fused = timed("fuser (ConvFuser)",
                  lambda a, b_: model.apply(variables, a, b_, method=fuse,
                                            mutable=["batch_stats"])[0],
                  cam_bev, lidar_bev)

    def dec_bb(m, x):
        return m.decoder_backbone(x, training=False)

    sec = timed("decoder/backbone (SECOND)",
                lambda x: model.apply(variables, x, method=dec_bb,
                                      mutable=["batch_stats"])[0],
                fused)

    def dec_neck(m, x):
        out = m.decoder_neck(x, training=False)
        return out[0] if isinstance(out, (list, tuple)) else out

    neck2 = timed("decoder/neck (SECONDFPN)",
                  lambda x: model.apply(variables, x, method=dec_neck,
                                        mutable=["batch_stats"])[0],
                  sec)

    def head_fwd(m, x):
        return m.head_modules["object"](x, training=False)

    preds = timed("head/forward (TransFusion)",
                  lambda x: model.apply(variables, x, method=head_fwd,
                                        mutable=["batch_stats"])[0],
                  neck2)

    def head_decode(m, p):
        return m.head_modules["object"].get_bboxes(p)

    timed("head/decode (get_bboxes+NMS)",
          lambda p: model.apply(variables, p, method=head_decode,
                                mutable=["batch_stats"])[0],
          preds)

    total = sum(dt for _, dt, _ in rows)
    if args.flops:
        tot_fl = sum(fl or 0.0 for _, _, fl in rows)
        print("\n| stage | ms | GFLOP | TFLOP/s | MFU |\n"
              "|---|---|---|---|---|")
        for name, dt, fl in rows:
            tfs = (fl or 0.0) / (dt * 1e-3) / 1e12
            print(f"| {name} | {dt:.2f} | {(fl or 0) / 1e9:.1f} "
                  f"| {tfs:.2f} | {tfs / PEAK_TFLOPS * 100:.1f}% |")
        ttfs = tot_fl / (total * 1e-3) / 1e12
        print(f"| **sum (stage-jitted)** | **{total:.2f}** | "
              f"**{tot_fl / 1e9:.1f}** | **{ttfs:.2f}** | "
              f"**{ttfs / PEAK_TFLOPS * 100:.1f}%** |")
        import json
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "MFU_r05.json"), "w") as fh:
            json.dump({
                "peak_tflops_bf16_measured": PEAK_TFLOPS,
                "stages": [{"stage": n, "ms": round(dt, 2),
                            "gflop": round((fl or 0) / 1e9, 2),
                            "tflops": round((fl or 0) / (dt * 1e-3) / 1e12, 3),
                            "mfu_pct": round((fl or 0) / (dt * 1e-3) / 1e12
                                             / PEAK_TFLOPS * 100, 2)}
                           for n, dt, fl in rows],
                "sum_ms": round(total, 2),
                "sum_gflop": round(tot_fl / 1e9, 2),
                "sum_mfu_pct": round(ttfs / PEAK_TFLOPS * 100, 2),
            }, fh, indent=1)
        print("wrote MFU_r05.json")
    else:
        print("\n| stage | ms |\n|---|---|")
        for name, dt, _ in rows:
            print(f"| {name} | {dt:.2f} |")
        print(f"| **sum (stage-jitted)** | **{total:.2f}** |")


if __name__ == "__main__":
    main()
