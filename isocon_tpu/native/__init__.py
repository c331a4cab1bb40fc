from .loader import get_lib, myers_ed, myers_ed_batch, native_available
