from .audio_files import read_wav, write_wav
from .model_store import load_modal_model, save_modal_model, modal_model_key
from .realimpact import RealImpactScan, load_listener_points, load_realimpact_scan

__all__ = [
    "read_wav",
    "write_wav",
    "load_modal_model",
    "save_modal_model",
    "modal_model_key",
    "RealImpactScan",
    "load_listener_points",
    "load_realimpact_scan",
]
