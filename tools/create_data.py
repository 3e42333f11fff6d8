"""Offline data prep CLI (reference: tools/create_data.py):
  python tools/create_data.py nuscenes --root data/nuscenes
builds nuscenes_infos_{train,val}.pkl + the GT database for ObjectPaste.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["nuscenes"])
    ap.add_argument("--root", default="data/nuscenes")
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--max-sweeps", type=int, default=10)
    ap.add_argument("--skip-gt-database", action="store_true")
    args = ap.parse_args()

    from bevfusion_tpu.data.converter import create_gt_database, create_nuscenes_infos

    n_train, n_val = create_nuscenes_infos(
        args.root, version=args.version, max_sweeps=args.max_sweeps
    )
    print(f"infos: {n_train} train / {n_val} val")

    if not args.skip_gt_database and "test" not in args.version:
        classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
                   "barrier", "motorcycle", "bicycle", "pedestrian",
                   "traffic_cone"]
        create_gt_database(
            args.root,
            os.path.join(args.root, "nuscenes_infos_train.pkl"),
            classes,
        )


if __name__ == "__main__":
    main()
