from .observability import Meter, device_profile, log_metrics

__all__ = ["Meter", "device_profile", "log_metrics"]
