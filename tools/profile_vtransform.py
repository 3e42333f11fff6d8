"""Per-op breakdown of the camera vtransform (DepthLSS + bev_pool).

Times each sub-op at flagship scale (B=1, N=6, D=118, 32x88 features,
360x360 BEV) as separately-jitted scalar-reduced programs — the same
harness as tools/profile_meta.py. Informs the calibration-LUT split:
which per-frame ops depend only on calibration+aug matrices (sort,
rank/meta, pixel indices) vs on the frame (depthnet, gathers, kernel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.models.vtransforms import (DepthLSSTransform,
                                                  get_geometry,
                                                  rasterize_depth)
    from bevfusion_tpu.ops.bev_pool import cell_ids_from_geometry
    from bevfusion_tpu.ops import bev_pool_pallas as bp
    from bevfusion_tpu.ops.grid import create_frustum, gen_dx_bx
    from bevfusion_tpu.runtime.flagship import (synthetic_calibration,
                                                synthetic_lidar_scan)

    B, N, fH, fW, C = 1, 6, 32, 88, 80
    image_size = (256, 704)
    xbound = (-54.0, 54.0, 0.3)
    ybound = (-54.0, 54.0, 0.3)
    zbound = (-10.0, 10.0, 20.0)
    dbound = (1.0, 60.0, 0.5)
    dx, bx, nx = gen_dx_bx(xbound, ybound, zbound)
    frustum = jnp.asarray(create_frustum(image_size, (fH, fW), dbound))
    D = frustum.shape[0]
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    num_cells = Z * X * Y

    mats = {k: jnp.asarray(v) for k, v in
            synthetic_calibration(B, N, image_size).items()}
    pts_np, pmask_np = synthetic_lidar_scan(
        120000, [-54, -54, -5, 54, 54, 3], seed=0)
    points = jnp.asarray(pts_np)[None]
    pmask = jnp.asarray(pmask_np)[None]

    rng = np.random.RandomState(0)
    depth = jax.nn.softmax(jnp.asarray(
        rng.rand(B, N, D, fH, fW).astype(np.float32)), axis=2)
    ctx = jnp.asarray(rng.rand(B, N, fH, fW, C).astype(np.float32))

    def timed(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        for _ in range(2):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:46s} {dt:8.2f} ms", flush=True)
        return dt

    # --- geometry chain (calibration-only work; LUT candidates) --------
    timed("rasterize_depth (120k pts x 6 cams)",
          lambda p, m, l2i, ia, la: jnp.sum(rasterize_depth(
              p, m, l2i, ia, la, image_size)),
          points, pmask, mats["lidar2image"], mats["img_aug_matrix"],
          mats["lidar_aug_matrix"])
    timed("get_geometry + cell_ids (2M frustum pts)",
          lambda c2l, intr, ia, la: (lambda g: (lambda iv: jnp.sum(
              iv[0].astype(jnp.float32)) + jnp.sum(iv[1]))(
              cell_ids_from_geometry(g, jnp.asarray(dx), jnp.asarray(bx), nx)))(
              get_geometry(frustum, c2l, intr, ia, la)),
          mats["camera2lidar"], mats["camera_intrinsics"][..., :3, :3],
          mats["img_aug_matrix"], mats["lidar_aug_matrix"])

    geom = jax.jit(lambda: get_geometry(
        frustum, mats["camera2lidar"], mats["camera_intrinsics"][..., :3, :3],
        mats["img_aug_matrix"], mats["lidar_aug_matrix"]))()
    ids, valid = jax.jit(lambda g: cell_ids_from_geometry(
        g, jnp.asarray(dx), jnp.asarray(bx), nx))(geom)

    # --- pool internals (one sample) ------------------------------------
    Np = N * D * fH * fW
    CH = bp.CHUNK
    Np_pad = (Np + CH - 1) // CH * CH
    ids_f = jnp.where(valid[0], ids[0], num_cells).reshape(-1).astype(jnp.int32)
    ids_f = jnp.pad(ids_f, (0, Np_pad - Np), constant_values=num_cells)
    dep_f = jnp.pad(depth[0].reshape(-1), (0, Np_pad - Np))

    timed("sort3 (ids, depth, iota)",
          lambda i, d: jnp.sum(jax.lax.sort(
              (i, d, jax.lax.iota(jnp.int32, Np_pad)), num_keys=1)[2]),
          ids_f, dep_f)

    iota = jax.lax.iota(jnp.int32, Np_pad)
    ids_s, d_s, order = jax.jit(lambda i, d: jax.lax.sort(
        (i, d, iota), num_keys=1))(ids_f, dep_f)
    HW = fH * fW
    pix_s = jax.jit(lambda o: jnp.where(
        o < Np, (o // (D * HW)) * HW + (o % HW), 0))(order)

    timed("ctx row gather (2M x 80ch bf16)",
          lambda cx, p: jnp.sum(jnp.take(
              cx.reshape(N * HW, C).astype(jnp.bfloat16), p, axis=0)
              .astype(jnp.float32)),
          ctx[0], pix_s)
    dep_idx = jax.jit(lambda o: jnp.where(o < Np, o, 0))(order)
    timed("depth 1D gather (2M f32, LUT candidate)",
          lambda d, ix: jnp.sum(jnp.take(d, ix)), dep_f, dep_idx)
    timed("depth as 2-lane bf16 row gather",
          lambda d, ix: jnp.sum(jnp.take(
              jnp.stack([d.astype(jnp.bfloat16),
                         (d - d.astype(jnp.bfloat16).astype(jnp.float32))
                         .astype(jnp.bfloat16)], axis=-1),
              ix, axis=0).astype(jnp.float32)),
          dep_f, dep_idx)

    timed("full _lss_pool_one (sort+gather+pack+kernel+scatter)",
          lambda d, cx, i, v: jnp.sum(bp._lss_pool_one(
              d, cx, i, v, num_cells, C)), depth[0], ctx[0], ids[0], valid[0])

    # --- full module -----------------------------------------------------
    vt = DepthLSSTransform(
        in_channels=256, out_channels=C, image_size=image_size,
        feature_size=(fH, fW), xbound=xbound, ybound=ybound, zbound=zbound,
        dbound=dbound, downsample=2, dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.rand(B, N, fH, fW, 256).astype(np.float32)).astype(jnp.bfloat16)
    vvars = jax.jit(lambda f, p, m: vt.init(
        jax.random.PRNGKey(0), f, p, pmask, mats, training=False))(
        feats, points, pmask)
    timed("FULL DepthLSSTransform",
          lambda f, p, m: jnp.sum(vt.apply(
              vvars, f, p, m, mats, training=False).astype(jnp.float32)),
          feats, points, pmask)


if __name__ == "__main__":
    main()
