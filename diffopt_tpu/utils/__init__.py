from .config import (
    DEFAULT_CONFIG,
    DiffOptConfig,
    get_config,
    set_config,
    use_config,
)
from . import batching

__all__ = [
    "DiffOptConfig",
    "DEFAULT_CONFIG",
    "get_config",
    "set_config",
    "use_config",
    "batching",
]
