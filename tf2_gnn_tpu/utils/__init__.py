from .constants import SMALL_NUMBER

__all__ = ["SMALL_NUMBER"]
