from . import losses  # noqa: F401  (registers loss modules)
from .backbones import resnet  # noqa: F401
from .backbones import swin  # noqa: F401
from .necks import fpn  # noqa: F401
from .dense_heads import condinst_head  # noqa: F401
from .dense_heads import box_solov2_head  # noqa: F401
from .dense_heads import discobox_head  # noqa: F401
from .dense_heads import box2mask_head  # noqa: F401
from . import plugins  # noqa: F401
from . import utils  # noqa: F401
from .detectors import condinst  # noqa: F401
from .detectors import single_stage_boxseg  # noqa: F401
from .detectors import single_stage_ts  # noqa: F401
from .detectors import maskformer  # noqa: F401
