"""Reference-compatible import path: the reference exposes
``from merfish3danalysis.DataRegistration import DataRegistration``."""

from .ops.flow import SofimaRegistrationConfig
from .pipeline.registration import (
    DataRegistration,
    GlobalFusionConfig,
    GlobalRegistrationConfig,
    no_op,
    time_stamp,
)

__all__ = [
    "DataRegistration",
    "GlobalRegistrationConfig",
    "GlobalFusionConfig",
    "SofimaRegistrationConfig",
    "no_op",
    "time_stamp",
]
