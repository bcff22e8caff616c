from .store import qi2labDataStore
from . import zarrio

__all__ = ["qi2labDataStore", "zarrio"]
