"""Reference-compatible import path: the reference exposes
``from merfish3danalysis.qi2labDataStore import qi2labDataStore``."""

from .datastore.store import qi2labDataStore

__all__ = ["qi2labDataStore"]
