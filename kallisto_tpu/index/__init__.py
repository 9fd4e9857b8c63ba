from .build import build_index, TpuIndex  # noqa: F401
from .format import save_index, load_index  # noqa: F401
