from .loader import (
    get_lib,
    hw_banded_traceback,
    myers_ed,
    myers_ed_batch,
    native_available,
)
