"""Model export CLI.

Reference: tools/export.py exports to ONNX for TensorRT deployment. The
TPU-native equivalent is StableHLO via jax.export — a portable,
versioned serialization of the compiled inference function that
deployment stacks (including non-TPU PJRT runtimes) can load.

  python tools/export.py <config> --out model.stablehlo [--checkpoint ckpt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="model.stablehlo")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--points", type=int, default=120000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from bevfusion_tpu.runtime.flagship import build_flagship

    cfg, model, batch = build_flagship(
        batch_size=args.batch_size, dtype=jnp.bfloat16,
        config_path=args.config, num_points=args.points,
    )
    if args.checkpoint:
        from bevfusion_tpu.runtime.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint)
        variables = {"params": state["params"] if "params" in state else state,
                     "batch_stats": state.get("batch_stats", {})}
    else:
        variables = jax.jit(
            lambda b: model.init(jax.random.PRNGKey(0), b, training=False)
        )(batch)

    def infer(vars_, batch_):
        out, _ = model.apply(vars_, batch_, training=False,
                             mutable=["batch_stats"])
        return out["boxes"]

    exported = jexport.export(jax.jit(infer))(variables, batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes of StableHLO to {args.out}")
    print("in_avals:", len(exported.in_avals), "platforms:", exported.platforms)


if __name__ == "__main__":
    main()
