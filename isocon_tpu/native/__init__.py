from .loader import (
    affine_sg_batch,
    get_lib,
    hw_banded_traceback,
    myers_ed,
    myers_ed_batch,
    myers_ed_batch_k,
    native_available,
)
