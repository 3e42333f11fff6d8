import os
import textwrap

from bevfusion_tpu.config import Config, load_config, recursive_eval


def _write(tmp_path, rel, content):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_hierarchical_merge_and_interpolation(tmp_path):
    _write(
        tmp_path,
        "configs/default.yaml",
        """
        max_epochs: 20
        image_size: [256, 704]
        model:
          type: BEVFusion
          fuser: null
        """,
    )
    _write(
        tmp_path,
        "configs/det/default.yaml",
        """
        model:
          heads:
            object:
              feature_size: ${[image_size[0] // 8, image_size[1] // 8]}
        """,
    )
    leaf = _write(
        tmp_path,
        "configs/det/leaf.yaml",
        """
        voxel_size: [0.1, 0.1, 0.2]
        derived: ${voxel_size[:2]}
        ann: ${dataset_root + "infos.pkl"}
        dataset_root: data/
        model:
          fuser:
            type: ConvFuser
        """,
    )
    cfg = load_config(leaf)
    assert cfg.max_epochs == 20
    assert cfg.model.type == "BEVFusion"
    assert cfg.model.heads.object.feature_size == [32, 88]
    assert cfg.derived == [0.1, 0.1]
    assert cfg.ann == "data/infos.pkl"
    assert cfg.model.fuser.type == "ConvFuser"


def test_null_replaces_subtree(tmp_path):
    _write(tmp_path, "c/default.yaml", "model: {encoders: {camera: {a: 1}}}")
    leaf = _write(tmp_path, "c/leaf.yaml", "model: {encoders: {camera: null}}")
    cfg = load_config(leaf)
    assert cfg.model.encoders.camera is None


def test_dotted_overrides(tmp_path):
    leaf = _write(tmp_path, "c/leaf.yaml", "model: {lr: 1.0}")
    cfg = load_config(leaf, overrides={"model.lr": 2.0, "model.new.k": 3})
    assert cfg.model.lr == 2.0
    assert cfg.model.new.k == 3


def test_chained_interpolation():
    cfg = Config.from_dict(
        {"a": 2, "b": "${a * 3}", "c": "${b + 1}", "d": "x${a}y"}
    )
    out = recursive_eval(cfg)
    assert out.b == 6 and out.c == 7 and out.d == "x2y"


def test_reference_config_shapes():
    """Load the ported config tree once it exists."""
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    leaf = os.path.join(
        root,
        "nuscenes/det/transfusion/secfpn/camera+lidar/swint_v0p075/convfuser.yaml",
    )
    if not os.path.exists(leaf):
        return
    cfg = load_config(leaf)
    assert cfg.model.fuser.in_channels == [80, 256]
    assert cfg.model.encoders.camera.vtransform.xbound == [-54.0, 54.0, 0.3]
    assert cfg.voxel_size == [0.075, 0.075, 0.2]
