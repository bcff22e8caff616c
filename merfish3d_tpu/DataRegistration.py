"""Reference-compatible import path: the reference exposes
``from merfish3danalysis.DataRegistration import DataRegistration``."""

from .ops.flow import SofimaRegistrationConfig
from .pipeline.registration import (
    DataRegistration,
    GlobalFusionConfig,
    GlobalRegistrationConfig,
)

__all__ = [
    "DataRegistration",
    "GlobalRegistrationConfig",
    "GlobalFusionConfig",
    "SofimaRegistrationConfig",
]
