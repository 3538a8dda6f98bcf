from . import kkt, linalg

__all__ = ["kkt", "linalg"]
