from mgtpu.ops.resample import (
    avgpool,
    maxpool2_ceil,
    maxpool,
    upsample_nearest2,
    global_avgpool,
)
from mgtpu.ops.mg import (
    resample_concat,
    MgConvInput,
    MgConv,
    MgResidual,
    MgPool,
    MgUpConv,
    MgStem7x7,
    PerScale,
    pyramid_widths_after_exchange,
)
