from .config import DEFAULT_CONFIG, DiffOptConfig
from . import batching

__all__ = ["DiffOptConfig", "DEFAULT_CONFIG", "batching"]
