from .loader import (
    affine_sg_batch,
    get_lib,
    hw_banded_traceback,
    hw_traceback_batch,
    myers_ed,
    myers_ed_batch,
    myers_ed_batch_k,
    native_available,
)
