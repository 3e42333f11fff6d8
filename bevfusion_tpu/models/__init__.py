"""Model zoo: importing this package registers every component."""
from . import fusers  # noqa: F401
from . import necks  # noqa: F401
from . import pillar_encoder  # noqa: F401
from . import pointnet_modules  # noqa: F401
from . import resnet  # noqa: F401
from . import resnet_full  # noqa: F401
from . import second  # noqa: F401
from . import sparse_encoder  # noqa: F401
from . import swin  # noqa: F401
from . import vtransforms  # noqa: F401
from .heads import centerpoint  # noqa: F401
from .heads import segm  # noqa: F401
from .heads import transfusion  # noqa: F401
from . import bevdepth  # noqa: F401
from . import dla  # noqa: F401
from . import radar_encoder  # noqa: F401
from . import vovnet  # noqa: F401
from . import bevfusion  # noqa: F401

from ..registry import FUSIONMODELS


def build_model(model_cfg, dtype=None):
    """Build the top-level fusion model from a config dict
    (the reference's build_model + FUSIONMODELS.build,
    mmdet3d/models/builder.py:31-41)."""
    kw = {}
    if dtype is not None:
        kw["dtype"] = dtype
    return FUSIONMODELS.build(
        model_cfg if isinstance(model_cfg, dict) else dict(model_cfg), **kw
    )
